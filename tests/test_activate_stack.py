"""CI coverage of scripts/activate_eval_stack.py (VERDICT round-2 #10).

The real weight files cannot enter the zero-egress container, so these tests
synthesize random-weight torch checkpoints in the EXACT on-disk layouts the
activation script consumes (pytorch-fid InceptionV3 state_dict, lpips VGG16
LPIPS state_dict, FENeRF segNet-20Class BiSeNet state_dict), torch.save them,
and drive the three activate_* functions end to end. When the gated files
land, only the paths change — and this suite guarantees the conversion path
has not rotted in the meantime.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import activate_eval_stack as act


def _rand(rng, *shape):
    return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.1)


def _conv_bn(sd, rng, prefix, cin, cout, kh, kw):
    sd[f"{prefix}.conv.weight"] = _rand(rng, cout, cin, kh, kw)
    sd[f"{prefix}.bn.weight"] = _rand(rng, cout).abs() + 0.5
    sd[f"{prefix}.bn.bias"] = _rand(rng, cout)
    sd[f"{prefix}.bn.running_mean"] = _rand(rng, cout)
    sd[f"{prefix}.bn.running_var"] = _rand(rng, cout).abs() + 0.5


def synth_inception_sd():
    """Random weights, pytorch-fid InceptionV3 key layout/shapes."""
    from fenerf_tpu.nn.inception import _BLOCK_CONVS, _STEM_SPECS

    rng = np.random.RandomState(0)
    sd = {}
    for stem, cin, cout, k in _STEM_SPECS:
        _conv_bn(sd, rng, stem, cin, cout, k, k)
    for block, branches in _BLOCK_CONVS.items():
        for br, (cin, cout, kh, kw) in branches.items():
            _conv_bn(sd, rng, f"{block}.{br}", cin, cout, kh, kw)
    return sd


def synth_lpips_sd():
    """Random weights, lpips.LPIPS(net='vgg') key layout: VGG16 convs under
    net.slice{1..5} keeping torchvision feature indices, heads under
    lins.{i}.model.1 (non-negative, as in the real distribution)."""
    rng = np.random.RandomState(1)
    # (slice, feature-index, cin, cout) for the 13 VGG16 convs
    plan = [(1, 0, 3, 64), (1, 2, 64, 64),
            (2, 5, 64, 128), (2, 7, 128, 128),
            (3, 10, 128, 256), (3, 12, 256, 256), (3, 14, 256, 256),
            (4, 17, 256, 512), (4, 19, 512, 512), (4, 21, 512, 512),
            (5, 24, 512, 512), (5, 26, 512, 512), (5, 28, 512, 512)]
    sd = {}
    for sl, idx, cin, cout in plan:
        sd[f"net.slice{sl}.{idx}.weight"] = _rand(rng, cout, cin, 3, 3)
        sd[f"net.slice{sl}.{idx}.bias"] = _rand(rng, cout)
    for i, ch in enumerate((64, 128, 256, 512, 512)):
        sd[f"lins.{i}.model.1.weight"] = _rand(rng, 1, ch, 1, 1).abs()
    return sd


class TestActivateStack:
    def test_inception(self, tmp_path):
        pth = tmp_path / "pt_inception.pth"
        torch.save(synth_inception_sd(), pth)
        out = act.activate_inception(str(pth), str(tmp_path))
        data = np.load(out)
        assert any(k.startswith("Mixed_7c/") for k in data.files)

    def test_lpips(self, tmp_path):
        pth = tmp_path / "lpips_vgg.pth"
        torch.save(synth_lpips_sd(), pth)
        out = act.activate_lpips(str(pth), str(tmp_path))
        from fenerf_tpu.eval.lpips import load_lpips

        fn = load_lpips(out)
        a = np.zeros((1, 3, 32, 32), np.float32)
        assert float(fn(a, a)) < 1e-5

    def test_bisenet(self, tmp_path):
        from reference_shim import import_reference_siren

        import_reference_siren()
        import importlib

        ref_bisenet = importlib.import_module("generators.BiSeNet")
        torch.manual_seed(0)
        net = ref_bisenet.BiSeNet(n_classes=20)
        net.eval()
        pth = tmp_path / "segNet-20Class.pth"
        torch.save(net.state_dict(), pth)
        act.activate_bisenet(str(pth))

    def _synth_released(self, tmp_path):
        """Whole-module pickle + sibling ema.pth in the released layout."""
        from reference_shim import (import_reference_generators,
                                    import_reference_siren)
        from test_convert_checkpoint import FakeEma

        ref_siren = import_reference_siren()
        ref_gen = import_reference_generators()
        torch.manual_seed(0)
        tg = ref_gen.DoubleImplicitGenerator3d(
            lambda **kw: ref_siren.SIRENBASELINESEMANTICDISENTANGLE(
                **{**kw, "hidden_dim": 32}),
            8, 8, 22)
        tg.device = torch.device("cpu")
        tg.siren.device = torch.device("cpu")
        tg.step = 5
        torch.save(tg, str(tmp_path / "generator.pth"))
        torch.save(FakeEma(tg.parameters()), str(tmp_path / "ema.pth"))
        return str(tmp_path / "generator.pth")

    def test_released_gate(self, tmp_path):
        """The --released gate on a synthesized released-layout checkpoint:
        convert + field parity vs the torch module + render smoke, with the
        measured max|Δ| under the gate threshold."""
        gen_pth = self._synth_released(tmp_path)
        npz, delta = act.activate_released(gen_pth, str(tmp_path / "out"))
        assert os.path.exists(npz)
        assert delta < 2e-3
        assert os.path.exists(
            os.path.join(str(tmp_path / "out"), "released_mv", "img_0.png"))

    def test_fid_smoke_gate(self, tmp_path):
        """The --fid_smoke gate end to end with synthesized stand-ins:
        random-weight InceptionV3 + a tiny film checkpoint + 4 synthetic
        reals -> finite FID through the real feature-extractor code path."""
        from PIL import Image

        import jax

        from fenerf_tpu.apps.common import save_generator
        from fenerf_tpu.nn import fields

        inc_pth = tmp_path / "pt_inception.pth"
        torch.save(synth_inception_sd(), inc_pth)
        inc_npz = act.activate_inception(str(inc_pth), str(tmp_path))

        cfg = fields.get_config("SIRENBASELINESEMANTICDISENTANGLE",
                                hidden_dim=16, map_hidden_dim=16,
                                z_geo_dim=8, z_app_dim=8)
        params = fields.init_field(jax.random.key(0), cfg)
        ckpt = str(tmp_path / "g.npz")
        save_generator(ckpt, params, params, params,
                       "SIRENBASELINESEMANTICDISENTANGLE", step=1,
                       field_kwargs=dict(hidden_dim=16, map_hidden_dim=16,
                                         z_geo_dim=8, z_app_dim=8))

        rng = np.random.RandomState(0)
        reals = tmp_path / "reals"
        reals.mkdir()
        for i in range(4):
            Image.fromarray(
                rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)).save(
                reals / f"{i}.png")

        fid = act.fid_smoke(inc_npz, ckpt, str(reals / "*.png"),
                            str(tmp_path / "fidout"), n=4, img_size=32,
                            num_steps=2)
        assert np.isfinite(fid)
