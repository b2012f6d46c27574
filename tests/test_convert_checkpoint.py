"""End-to-end conversion of a reference whole-module .pth checkpoint."""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_shim import import_reference_generators, import_reference_siren

ref_siren = import_reference_siren()
ref_gen = import_reference_generators()


class FakeEma:
    """Stand-in for torch_ema (not installed): same shadow_params shape."""

    def __init__(self, params):
        self.shadow_params = [q.detach().clone() + 0.1 for q in params]


class TestConvertCheckpoint:
    def test_full_module_pickle_roundtrip(self, tmp_path):
        torch.manual_seed(0)
        tg = ref_gen.DoubleImplicitGenerator3d(
            lambda **kw: ref_siren.SIRENBASELINESEMANTICDISENTANGLE(
                **{**kw, "hidden_dim": 32}),
            8, 8, 22)
        tg.step = 777
        gen_path = str(tmp_path / "generator.pth")
        torch.save(tg, gen_path)

        from fenerf_tpu.apps.convert_checkpoint import main
        out = str(tmp_path / "generator.npz")
        main(["--generator", gen_path, "--out", out,
              "--model", "SIRENBASELINESEMANTICDISENTANGLE"])

        from fenerf_tpu.apps.common import load_generator
        from fenerf_tpu.nn import fields
        params, ema, ema2, fcfg, config = load_generator(out)
        assert config["step"] == 777
        assert fcfg.z_geo_dim == 8

        # converted params must reproduce the torch forward
        rng = np.random.RandomState(1)
        pts = rng.randn(1, 7, 3).astype(np.float32) * 0.1
        dirs = rng.randn(1, 7, 3).astype(np.float32)
        zg = rng.randn(1, 8).astype(np.float32)
        za = rng.randn(1, 8).astype(np.float32)
        with torch.no_grad():
            ref = tg.siren(torch.tensor(pts), torch.tensor(zg),
                           torch.tensor(za),
                           ray_directions=torch.tensor(dirs)).numpy()
        fg, fa = fields.field_film(params, fcfg, jnp.asarray(zg),
                                   jnp.asarray(za))
        ours = fields.apply_field(params, fcfg, jnp.asarray(pts),
                                  jnp.asarray(dirs), fg, fa)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4,
                                   rtol=1e-3)

    def test_with_torch_ema_file(self, tmp_path):
        # torch_ema isn't installed here; FakeEma (module level, picklable)
        # exercises the positional shadow_params re-association
        torch.manual_seed(1)
        tg = ref_gen.DoubleImplicitGenerator3d(
            lambda **kw: ref_siren.SIRENBASELINESEMANTICDISENTANGLE(
                **{**kw, "hidden_dim": 16}),
            8, 8, 22)
        ema = FakeEma(tg.parameters())
        gen_path = str(tmp_path / "generator.pth")
        torch.save(tg, gen_path)
        torch.save(ema, str(tmp_path / "ema.pth"))

        from fenerf_tpu.apps.convert_checkpoint import main
        out = str(tmp_path / "g.npz")
        main(["--generator", gen_path, "--out", out, "--model", "auto"])
        from fenerf_tpu.apps.common import load_generator
        params, ema_p, _, fcfg, _ = load_generator(out)
        a = np.asarray(jax.tree_util.tree_leaves(params)[0])
        b = np.asarray(jax.tree_util.tree_leaves(ema_p)[0])
        assert np.abs(a - b).max() > 0  # ema differs from live params
