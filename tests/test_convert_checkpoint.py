"""End-to-end conversion of a reference whole-module .pth checkpoint,
including the exact released-checkpoint user chain: generator.pth + sibling
ema.pth -> convert_checkpoint -> render_multiview -> pixels match the
reference's own render script flow
(render_multiview_images_double_semantic.py:58-84)."""
import math
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
    """Stand-in for torch_ema (not installed): same shadow_params shape and
    the copy_to the reference render script calls (:63). The shadow is a
    small RELATIVE perturbation of the live weights — a real EMA sits next
    to them; a large uniform shift drives FiLM args outside the documented
    fast_sin reduction domain (ops/fast_math.py:48) and renders garbage."""

    def __init__(self, params, scale=0.01):
        self.shadow_params = [q.detach().clone() * (1.0 + scale) + scale * 0.001
                              for q in params]

    def copy_to(self, parameters):
        for p, s in zip(parameters, self.shadow_params):
            p.data.copy_(s)


def _fixed_rand():
    """Context: torch.rand -> 0.5 (kills the ray-jitter RNG, matching our
    perturb=False; pattern from test_generator.py)."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        orig = torch.rand
        torch.rand = lambda *s, **kw: torch.full(
            s[0] if len(s) == 1 and not isinstance(s[0], int) else s, 0.5,
            **kw)
        try:
            yield
        finally:
            torch.rand = orig

    return cm()


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


class TestReleasedCheckpointChain:
    """The documented user chain for the two released models
    (README.md Pretrained Models): a whole-module generator.pth with a
    SIBLING ema.pth, rendered via the multiview script. Here: synthesize
    that exact file layout with random weights, run our chain
    (convert_checkpoint -> render_multiview --z_file --deterministic), and
    compare pixels against the reference script's flow (torch.load ->
    ema.copy_to -> staged_forward per yaw, :58-84). When the real released
    files land, they are a path swap."""

    YAWS = [-0.5, -0.25, 0.0, 0.25, 0.5]

    def test_film_family_pixels(self, tmp_path):
        torch.manual_seed(0)
        tg = ref_gen.DoubleImplicitGenerator3d(
            lambda **kw: ref_siren.SIRENBASELINESEMANTICDISENTANGLE(
                **{**kw, "hidden_dim": 32}),
            8, 8, 22)
        tg.device = torch.device("cpu")
        tg.siren.device = torch.device("cpu")
        tg.step = 31
        ema = FakeEma(tg.parameters())
        torch.save(tg, str(tmp_path / "generator.pth"))
        torch.save(ema, str(tmp_path / "ema.pth"))  # sibling convention

        from fenerf_tpu.apps.convert_checkpoint import main as convert
        npz = str(tmp_path / "g.npz")
        convert(["--generator", str(tmp_path / "generator.pth"),
                 "--out", npz, "--model", "auto"])

        rng = np.random.RandomState(3)
        zg = rng.randn(1, 8).astype(np.float32)
        za = rng.randn(1, 8).astype(np.float32)
        np.savez(str(tmp_path / "z.npz"), z_geo=zg, z_app=za)

        from fenerf_tpu.apps.render_multiview import main as render
        outdir = str(tmp_path / "mv")
        render(["--ckpt", npz, "--seeds", "0", "--output_dir", outdir,
                "--image_size", "16", "--num_steps", "3",
                "--ray_step_multiplier", "2", "--psi", "1.0",
                "--deterministic", "--z_file", str(tmp_path / "z.npz"),
                "--ray_chunk", "0"])
        from PIL import Image
        got = np.asarray(Image.open(os.path.join(outdir, "img_0.png")))
        got_seg = np.asarray(Image.open(os.path.join(outdir, "seg_0.png")))

        # the reference script's own flow, deterministic mode
        ema.copy_to(tg.parameters())
        tg.eval()
        meta = dict(img_size=16, fov=12.0, ray_start=0.88, ray_end=1.12,
                    num_steps=6, h_stddev=0.0, v_stddev=0.0,
                    v_mean=math.pi / 2, hierarchical_sample=False,
                    sample_dist=None, clamp_mode="relu", nerf_noise=0.0,
                    psi=1.0, fill_mode="seg_padding_background",
                    fill_color="black", max_batch_size=10 ** 7)
        pix_list = []
        with _fixed_rand():
            for off in self.YAWS:
                with torch.no_grad():
                    pix, _ = tg.staged_forward(
                        torch.tensor(zg), torch.tensor(za),
                        h_mean=math.pi / 2 + off, **meta)
                pix_list.append(pix.numpy()[0])
        pix_all = np.stack(pix_list)  # (5, 22, 16, 16)

        from fenerf_tpu.utils.image import make_grid, mask2color, to_uint8
        ref_grid = make_grid(
            to_uint8(pix_all[:, -3:], normalize=True).transpose(0, 2, 3, 1),
            nrow=5)
        assert got.shape == ref_grid.shape
        diff = np.abs(got.astype(int) - ref_grid.astype(int))
        # the seg_padding fill hard-thresholds weights_sum at 0.9
        # (volumetric_rendering.py:71-82): pixels near it flip whole-hog on
        # f32 jitter, so tolerate isolated flips but require everything
        # else to agree to a few gray levels
        flipped = (diff > 8).any(axis=-1).mean()
        assert flipped < 0.02, flipped
        assert np.median(diff) <= 1 and diff.mean() < 3.0, (np.median(diff),
                                                            diff.mean())
        ref_seg = make_grid(mask2color(pix_all[:, :-3]), nrow=5)
        agree = (got_seg == ref_seg).all(axis=-1).mean()
        assert agree > 0.97, agree  # argmax ties can flip isolated pixels

    def test_grid_family_wrapped_module(self, tmp_path):
        # the w/-latent-grid release: SPATIALSIRENGRID under a generator
        # wrapper (ImplicitGenerator3d holds .siren, generators.py:13-25)
        torch.manual_seed(1)
        tg = ref_gen.ImplicitGenerator3d(
            lambda **kw: ref_siren.SPATIALSIRENGRID(
                input_dim=3, z_dim=kw["z_dim"], hidden_dim=32,
                output_dim=kw["output_dim"]),
            16, 4)
        tg.step = 12
        ema = FakeEma(tg.parameters())
        torch.save(tg, str(tmp_path / "generator.pth"))
        torch.save(ema, str(tmp_path / "ema.pth"))

        from fenerf_tpu.apps.convert_checkpoint import main as convert
        npz = str(tmp_path / "g.npz")
        convert(["--generator", str(tmp_path / "generator.pth"),
                 "--out", npz, "--model", "auto"])

        from fenerf_tpu.apps.common import load_generator
        params, ema_p, _, gcfg, config = load_generator(npz)
        assert config["family"] == "grid" and config["step"] == 12

        # the converted EMA must equal the torch side after copy_to
        from fenerf_tpu.nn import latent_grid_field as lgf
        ema.copy_to(tg.parameters())
        rng = np.random.RandomState(2)
        pts = rng.randn(1, 6, 3).astype(np.float32) * 0.1
        dirs = rng.randn(1, 6, 3).astype(np.float32)
        z = rng.randn(1, 16).astype(np.float32)
        with torch.no_grad():
            ref = tg.siren(torch.tensor(pts), torch.tensor(z),
                           torch.tensor(dirs)).numpy()
        ours = lgf.apply_grid_field(ema_p, gcfg, jnp.asarray(pts),
                                    jnp.asarray(dirs), jnp.asarray(z))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4)

        # and the documented render command runs on the converted file
        from fenerf_tpu.apps.render_multiview import main as render
        outdir = str(tmp_path / "mv")
        render(["--ckpt", npz, "--seeds", "0", "--output_dir", outdir,
                "--image_size", "16", "--num_steps", "3", "--ray_chunk", "0",
                "--deterministic"])
        assert os.path.exists(os.path.join(outdir, "img_0.png"))

    def test_hd_neural_renderer_chain(self, tmp_path):
        # HD release shape: StyleGenerator3d with embedded neural-renderer
        # heads (generators.py:914-918); convert must carry them and the
        # --hd render must apply them
        torch.manual_seed(3)
        import importlib

        import kornia.filters as kf

        from fenerf_tpu.nn.neural_renderer import (NeuralRendererConfig,
                                                   apply_neural_renderer)
        kf.filter2D = lambda x, f, normalized=True: x  # not exercised here
        nr_mod = importlib.import_module("generators.neural_rendering")
        importlib.reload(nr_mod)
        nr_img = nr_mod.NeuralRenderer(
            n_feat=16, input_dim=64, out_dim=3, min_feat=8, img_size=32,
            input_size=16, use_rgb_skip=True, upsample_feat="nn",
            upsample_rgb="nn")
        nr_seg = nr_mod.NeuralRenderer(
            n_feat=16, input_dim=64, out_dim=19, min_feat=8, img_size=32,
            input_size=16, use_rgb_skip=True, upsample_feat="nn",
            upsample_rgb="nn", final_actvn=False)
        tg = ref_gen.StyleGenerator3d(
            lambda **kw: ref_siren.SPATIALSIRENSEMANTICHD(
                input_dim=3, z_dim=kw["z_dim"], hidden_dim=32,
                output_dim=129),
            16, 129, neural_renderer_img=nr_img, neural_renderer_seg=nr_seg)
        tg.step = 9
        torch.save(tg, str(tmp_path / "generator.pth"))

        from fenerf_tpu.apps.convert_checkpoint import main as convert
        npz = str(tmp_path / "g.npz")
        convert(["--generator", str(tmp_path / "generator.pth"),
                 "--out", npz, "--model", "auto"])

        # stored heads reproduce the torch modules (config inference + import)
        from fenerf_tpu.apps.common import load_neural_renderers
        nrs = load_neural_renderers(npz)
        assert set(nrs) == {"nr_img", "nr_seg"}
        p_img, cfg_img = nrs["nr_img"]
        assert cfg_img.input_dim == 64 and cfg_img.out_dim == 3
        assert cfg_img.n_blocks == 1 and cfg_img.upsample_feat == "nn"
        x = np.random.RandomState(5).randn(1, 64, 8, 8).astype(np.float32)
        nr_img.eval()
        with torch.no_grad():
            ref = nr_img(torch.tensor(x)).numpy()
        ours = apply_neural_renderer(p_img, cfg_img, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)
        _, cfg_seg = nrs["nr_seg"]
        assert cfg_seg.out_dim == 19 and not cfg_seg.final_actvn

        # the --hd render applies them end-to-end (16px feats -> 32px out)
        rng = np.random.RandomState(6)
        np.savez(str(tmp_path / "z.npz"),
                 z_geo=rng.randn(1, 16).astype(np.float32))
        from fenerf_tpu.apps.render_multiview import main as render
        outdir = str(tmp_path / "mv")
        render(["--ckpt", npz, "--seeds", "0", "--output_dir", outdir,
                "--image_size", "32", "--num_steps", "2", "--ray_chunk", "0",
                "--deterministic", "--hd", "--z_file",
                str(tmp_path / "z.npz")])
        from PIL import Image
        img = np.asarray(Image.open(os.path.join(outdir, "img_0.png")))
        assert img.shape[0] >= 32 and np.isfinite(img).all()
        assert os.path.exists(os.path.join(outdir, "seg_0.png"))
