"""End-to-end wiring of the latent-grid family (SPATIALSIRENGRID):
checkpoint save/load dispatch, render/extract CLIs, reference-pickle
conversion with render parity, and GAN training through the shared loop.

Reference: siren/siren.py:413-518 (SPATIALSIRENGRID),
siren/latent_grid.py:9-137 (StyleGenerator2D); this family backs the second
released checkpoint ("FENeRF w/ latent grid", README.md:74).
"""
import json
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from fenerf_tpu.apps.common import load_generator, save_generator
from fenerf_tpu.models import generator as gen
from fenerf_tpu.nn import latent_grid_field as lgf

TINY_KW = dict(z_dim=8, hidden_dim=16, grid_res=8, grid_ch=8, ch_max=16,
               map_hidden_dim=16)


@pytest.fixture(scope="module")
def tiny_grid_ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gridckpt") / "generator.npz")
    gcfg = lgf.get_grid_config("SPATIALSIRENGRID", **TINY_KW)
    params = lgf.init_grid_field(jax.random.key(0), gcfg)
    ema = jax.tree.map(lambda x: x * 0.5, params)
    save_generator(path, params, ema, params, "SPATIALSIRENGRID", step=7,
                   field_kwargs=TINY_KW)
    return path


class TestGridCheckpoint:
    def test_roundtrip_with_family_tag(self, tiny_grid_ckpt):
        params, ema, ema2, cfg, config = load_generator(tiny_grid_ckpt)
        assert config["family"] == "grid"
        assert isinstance(cfg, lgf.GridFieldConfig)
        assert cfg.hidden_dim == 16 and cfg.z_dim == 8
        a = jax.tree_util.tree_leaves(params)[0]
        b = jax.tree_util.tree_leaves(ema)[0]
        np.testing.assert_allclose(np.asarray(a) * 0.5, np.asarray(b),
                                   atol=1e-7)

    def test_loaded_params_render(self, tiny_grid_ckpt):
        params, _, _, cfg, _ = load_generator(tiny_grid_ckpt)
        rcfg = gen.RenderConfig(img_size=8, num_steps=3)
        z = jax.random.normal(jax.random.key(1), (2, cfg.z_dim))
        out = gen.render_grid_from_z(params, cfg, rcfg, jax.random.key(0), z)
        assert out["pixels"].shape == (2, 3, 8, 8)
        assert np.isfinite(np.asarray(out["pixels"])).all()

    def test_get_any_config_dispatch(self):
        cfg = gen.get_any_config("SPATIALSIRENGRID", z_geo_dim=12)
        assert isinstance(cfg, lgf.GridFieldConfig) and cfg.z_dim == 12
        from fenerf_tpu.nn.fields import FieldConfig
        f = gen.get_any_config("SIRENBASELINESEMANTICDISENTANGLE")
        assert isinstance(f, FieldConfig)


class TestGridRenderCLIs:
    def test_render_multiview(self, tiny_grid_ckpt, tmp_path):
        from fenerf_tpu.apps.render_multiview import main
        out = str(tmp_path / "imgs")
        main(["--ckpt", tiny_grid_ckpt, "--seeds", "0", "--output_dir", out,
              "--image_size", "16", "--num_steps", "4",
              "--ray_step_multiplier", "2", "--ray_chunk", "0"])
        img = np.asarray(Image.open(os.path.join(out, "img_0.png")))
        assert img.shape[1] > 16 * 5  # 5 yaw views side by side
        assert not os.path.exists(os.path.join(out, "seg_0.png"))  # RGB-only

    def test_render_video(self, tiny_grid_ckpt, tmp_path):
        from fenerf_tpu.apps.render_video import main
        out = str(tmp_path / "videos")
        main(["--ckpt", tiny_grid_ckpt, "--seeds", "0", "--output_dir", out,
              "--image_size", "16", "--num_steps", "4", "--num_frames", "3",
              "--trajectory", "front", "--latent_type", "geo",
              "--ray_chunk", "0"])
        assert os.path.exists(os.path.join(out, "seed0_front_geo.mp4"))

    def test_extract_shapes(self, tiny_grid_ckpt, tmp_path):
        from fenerf_tpu.apps.extract_shapes import main
        from fenerf_tpu.utils.mrc import read_mrc
        out = str(tmp_path / "shapes")
        main(["--ckpt", tiny_grid_ckpt, "--seeds", "0", "--output_dir", out,
              "--voxel_resolution", "16", "--chunk", "1024"])
        vol = read_mrc(os.path.join(out, "shape_seed0.mrc"))
        assert vol.shape == (16, 16, 16)
        assert np.isfinite(vol).all()


class TestGridShardRays:
    """--shard_rays for the latent-grid family (round-4 verdict Missing #4c):
    same CLI bit-equality contract as the film family's TestShardRays."""

    def test_multiview_shard_rays_bit_equal(self, tiny_grid_ckpt, tmp_path):
        from fenerf_tpu.apps.render_multiview import main
        base = ["--ckpt", tiny_grid_ckpt, "--seeds", "2", "--image_size", "16",
                "--num_steps", "4", "--ray_step_multiplier", "2",
                "--ray_chunk", "0"]
        out_a, out_b = str(tmp_path / "plain"), str(tmp_path / "shard")
        main(base + ["--output_dir", out_a])
        main(base + ["--output_dir", out_b, "--shard_rays"])
        a = open(os.path.join(out_a, "img_2.png"), "rb").read()
        b = open(os.path.join(out_b, "img_2.png"), "rb").read()
        assert a == b

    def test_render_video_shard_rays(self, tiny_grid_ckpt, tmp_path):
        from fenerf_tpu.apps.render_video import main
        out = str(tmp_path / "videos")
        main(["--ckpt", tiny_grid_ckpt, "--seeds", "0", "--output_dir", out,
              "--image_size", "16", "--num_steps", "4", "--num_frames", "2",
              "--trajectory", "front", "--latent_type", "geo",
              "--ray_chunk", "0", "--shard_rays"])
        assert os.path.exists(os.path.join(out, "seed0_front_geo.mp4"))

    def test_extract_shapes_shard_equal(self, tiny_grid_ckpt, tmp_path):
        from fenerf_tpu.apps.extract_shapes import main
        from fenerf_tpu.utils.mrc import read_mrc
        base = ["--ckpt", tiny_grid_ckpt, "--seeds", "0",
                "--voxel_resolution", "16", "--chunk", "512"]
        out_a, out_b = str(tmp_path / "plain"), str(tmp_path / "shard")
        main(base + ["--output_dir", out_a])
        main(base + ["--output_dir", out_b, "--shard_rays"])
        a = read_mrc(os.path.join(out_a, "shape_seed0.mrc"))
        b = read_mrc(os.path.join(out_b, "shape_seed0.mrc"))
        np.testing.assert_allclose(a, b, atol=2e-6)


class TestGridConvert:
    def test_reference_pickle_to_npz_render_parity(self, tmp_path):
        torch = pytest.importorskip("torch")
        from reference_shim import import_reference_siren

        ref_siren = import_reference_siren()
        torch.manual_seed(0)
        tm = ref_siren.SPATIALSIRENGRID(input_dim=3, z_dim=16, hidden_dim=32,
                                        output_dim=4)
        tm.step = 55
        gen_path = str(tmp_path / "generator.pth")
        torch.save(tm, gen_path)

        from fenerf_tpu.apps.convert_checkpoint import main
        out = str(tmp_path / "generator.npz")
        main(["--generator", gen_path, "--out", out, "--model", "auto"])

        params, _, _, cfg, config = load_generator(out)
        assert config["family"] == "grid" and config["step"] == 55
        assert cfg.z_dim == 16 and cfg.hidden_dim == 32

        rng = np.random.RandomState(1)
        pts = rng.randn(1, 6, 3).astype(np.float32) * 0.1
        dirs = rng.randn(1, 6, 3).astype(np.float32)
        z = rng.randn(1, 16).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(pts), torch.tensor(z),
                     torch.tensor(dirs)).numpy()
        ours = lgf.apply_grid_field(params, cfg, jnp.asarray(pts),
                                    jnp.asarray(dirs), jnp.asarray(z))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


class TestGridTraining:
    def _make_data(self, tmp_path):
        root = tmp_path / "celeba"
        root.mkdir()
        rng = np.random.RandomState(0)
        for i in range(10):
            Image.fromarray((rng.rand(512, 512, 3) * 255).astype(np.uint8)
                            ).save(root / f"{i}.jpg")
        return os.path.join(str(root), "*.jpg")

    def test_train_cli_smoke_grid(self, tmp_path):
        from fenerf_tpu.apps.train import main
        out = str(tmp_path / "run")
        main(["--curriculum", "smoke_grid", "--global_batch",
              "--output_dir", out, "--data_root", self._make_data(tmp_path),
              "--total_steps", "3", "--eval_freq", "0",
              "--sample_interval", "1000", "--model_save_interval", "2",
              "--log_every", "1"])
        lines = [json.loads(l) for l in
                 open(os.path.join(out, "metrics.jsonl"))]
        assert all(np.isfinite(l["g_loss"]) for l in lines)
        # the rolling generator checkpoint is a loadable grid checkpoint
        params, _, _, cfg, config = load_generator(
            os.path.join(out, "generator.npz"))
        assert config["family"] == "grid"
        assert isinstance(cfg, lgf.GridFieldConfig)

    def test_updates_propagate_to_grid_params(self, tmp_path):
        """One train step changes the StyleGenerator2D, the per-point mapping
        net and the trunk (gradients flow through the whole grid path)."""
        from fenerf_tpu.train import loop as looplib
        from fenerf_tpu.train.curriculum import get_curriculum

        meta = get_curriculum("smoke_grid").at_step(0)
        state = looplib.init_train_state(jax.random.key(0), meta)
        b = meta.batch_size
        imgs = jax.random.uniform(jax.random.key(1),
                                  (b, 3, meta.img_size, meta.img_size)) * 2 - 1
        labels = jnp.zeros((b, 0, meta.img_size, meta.img_size))
        scal = looplib.StepScalars(alpha=jnp.asarray(1.0),
                                   noise_std=jnp.asarray(0.5),
                                   topk_frac=jnp.asarray(1.0))
        step_fn = looplib.jit_train_step(meta)
        # snapshot before stepping: the jitted step donates the state buffers
        before_parts = {
            part: [np.asarray(x) for x in
                   jax.tree_util.tree_leaves(state.g_params[part])]
            for part in ("style_gen", "map", "trunk")}
        new_state, metrics = step_fn(state, imgs, labels, jax.random.key(2),
                                     scal)
        for part in ("style_gen", "map", "trunk"):
            before = before_parts[part]
            after = jax.tree_util.tree_leaves(new_state.g_params[part])
            changed = any(
                not np.allclose(np.asarray(x), np.asarray(y))
                for x, y in zip(before, after))
            assert changed, f"{part} did not update"
        assert np.isfinite(float(metrics["g_loss"]))
        assert np.isfinite(float(metrics["d_img_loss"]))


class TestGridServe:
    def test_render_server_grid_family(self, tiny_grid_ckpt):
        """apps/serve.py grid branch: RGB-only model -> /render rgb works
        (kind=seg degrades to rgb since n_labels=0); psi accepted-but-ignored."""
        import json as jsonlib
        import threading
        import urllib.request
        import urllib.error

        from fenerf_tpu.apps.serve import build_renderer, make_server

        render_np, meta = build_renderer(
            tiny_grid_ckpt, image_size=16, num_steps=2,
            ray_step_multiplier=1, fov=12.0,
            fill_mode="seg_padding_background", fill_color="black",
            ray_chunk=0, use_ema=True)
        assert meta["family"] == "grid" and meta["n_labels"] == 0
        srv = make_server(render_np, meta, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            r = urllib.request.urlopen(
                base + "/render?seed=1&yaw=0.3&psi=0.2", timeout=120)
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
            m = jsonlib.loads(urllib.request.urlopen(
                base + "/meta", timeout=10).read())
            assert m["family"] == "grid"
        finally:
            srv.shutdown()
            srv.server_close()
