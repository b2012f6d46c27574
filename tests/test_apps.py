"""End-to-end smoke tests of the CLI apps on tiny configs (CPU)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

import jax

from fenerf_tpu.apps.common import (camera_trajectory, interpolate_films,
                                    load_generator, save_generator)
from fenerf_tpu.nn import fields

TINY_KW = dict(z_geo_dim=8, z_app_dim=8, hidden_dim=16, map_hidden_dim=16)


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt") / "generator.npz")
    fcfg = fields.get_config("SIRENBASELINESEMANTICDISENTANGLE", **TINY_KW)
    params = fields.init_field(jax.random.key(0), fcfg)
    ema = jax.tree.map(lambda x: x * 0.5, params)
    save_generator(path, params, ema, params,
                   "SIRENBASELINESEMANTICDISENTANGLE", step=123,
                   field_kwargs=TINY_KW)
    return path


class TestCommon:
    def test_generator_ckpt_roundtrip(self, tiny_ckpt):
        params, ema, ema2, fcfg, config = load_generator(tiny_ckpt)
        assert config["step"] == 123
        assert fcfg.hidden_dim == 16
        a = jax.tree_util.tree_leaves(params)[0]
        b = jax.tree_util.tree_leaves(ema)[0]
        np.testing.assert_allclose(np.asarray(a) * 0.5, np.asarray(b),
                                   atol=1e-7)

    def test_trajectories(self):
        for name in ("front", "orbit", "rotation_horizontal", "non_rotation",
                     "sphere", "inverse_sphere", "zoom", "rotation_linear"):
            traj = camera_trajectory(name, 7, 12.0)
            assert len(traj) == 7
            for t, pitch, yaw, fov in traj:
                assert 0 < pitch < np.pi and np.isfinite(yaw)
                assert 5 < fov < 25

    def test_interpolate_films(self):
        import jax.numpy as jnp
        f1 = (jnp.zeros(4), jnp.zeros(4))
        f2 = (jnp.ones(4), jnp.ones(4))
        g = interpolate_films(f1, f2, 0.5, "geo", "geo")
        np.testing.assert_allclose(g[0], 0.5)
        a_non = interpolate_films(f1, f2, 0.5, "geo", "app")
        np.testing.assert_allclose(a_non[0], 0.0)  # app held for 'geo'
        # 'app' remaps t: t=0.75 -> 0.5
        a = interpolate_films(f1, f2, 0.75, "app", "app")
        np.testing.assert_allclose(a[0], 0.5)


class TestRenderMultiview:
    def test_writes_grids(self, tiny_ckpt, tmp_path):
        from fenerf_tpu.apps.render_multiview import main
        out = str(tmp_path / "imgs")
        main(["--ckpt", tiny_ckpt, "--seeds", "0", "--output_dir", out,
              "--image_size", "16", "--num_steps", "4",
              "--ray_step_multiplier", "2", "--ray_chunk", "0"])
        assert os.path.exists(os.path.join(out, "img_0.png"))
        assert os.path.exists(os.path.join(out, "seg_0.png"))
        img = np.asarray(Image.open(os.path.join(out, "img_0.png")))
        assert img.shape[1] > 16 * 5  # 5 views side by side


class TestExtractShapes:
    def test_writes_mrc(self, tiny_ckpt, tmp_path):
        from fenerf_tpu.apps.extract_shapes import main
        from fenerf_tpu.utils.mrc import read_mrc
        out = str(tmp_path / "shapes")
        main(["--ckpt", tiny_ckpt, "--seeds", "0", "--output_dir", out,
              "--voxel_resolution", "16", "--chunk", "1024",
              "--export_ply", "--iso_level", "0.0"])
        path = os.path.join(out, "shape_seed0.mrc")
        vol = read_mrc(path)
        assert vol.shape == (16, 16, 16)
        assert np.isfinite(vol).all()
        # mesh written (possibly empty if sigma never crosses the level)
        assert os.path.exists(os.path.join(out, "shape_seed0.ply"))


class TestRenderVideo:
    def test_writes_mp4(self, tiny_ckpt, tmp_path):
        from fenerf_tpu.apps.render_video import main
        out = str(tmp_path / "videos")
        main(["--ckpt", tiny_ckpt, "--seeds", "0", "--output_dir", out,
              "--image_size", "16", "--num_steps", "4", "--num_frames", "3",
              "--trajectory", "front", "--latent_type", "both",
              "--ray_chunk", "0"])
        assert os.path.exists(
            os.path.join(out, "seed0_front_both.mp4"))


class TestInvert:
    def test_inversion_improves_loss(self, tiny_ckpt, tmp_path):
        from fenerf_tpu.apps.invert import main
        rng = np.random.RandomState(0)
        img_p = str(tmp_path / "gt.jpg")
        seg_p = str(tmp_path / "gt.png")
        Image.fromarray(
            (rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(img_p)
        Image.fromarray(
            rng.randint(0, 19, (64, 64)).astype(np.uint8), mode="L"
        ).save(seg_p)
        out = main(["test", "--ckpt", tiny_ckpt, "--image_path", img_p,
                    "--seg_path", seg_p, "--save_dir", str(tmp_path / "inv"),
                    "--image_size", "16", "--iterations", "3",
                    "--lambda_seg", "1", "--lambda_img", "1",
                    "--num_steps", "4", "--eval_every", "2"])
        data = np.load(out)
        assert "freq_geo" in data and "offset_freq_app" in data
        assert os.path.exists(str(tmp_path / "inv" / "mious.npy"))

        # warm start: the prior run's W+offsets become the new base
        # (reference inverse_render_double_semantic.py:352-361)
        out2 = main(["test2", "--ckpt", tiny_ckpt, "--image_path", img_p,
                     "--seg_path", seg_p,
                     "--save_dir", str(tmp_path / "inv2"),
                     "--image_size", "16", "--iterations", "1",
                     "--lambda_seg", "1", "--lambda_img", "1",
                     "--num_steps", "4", "--eval_every", "2",
                     "--load_offsets", out])
        data2 = np.load(out2)
        np.testing.assert_array_equal(data2["w_freq_geo"], data["freq_geo"])
        np.testing.assert_array_equal(data2["w_phase_app"],
                                      data["phase_app"])

    def test_lambda_percept_without_weights_fails(self, tiny_ckpt, tmp_path):
        """Silently dropping the perceptual term changes the requested
        objective — must hard-fail absent --allow_no_lpips."""
        from fenerf_tpu.apps.invert import main
        from fenerf_tpu.eval.lpips import load_lpips
        if load_lpips() is not None:
            pytest.skip("LPIPS weights present in this environment")
        rng = np.random.RandomState(0)
        img_p = str(tmp_path / "gt.jpg")
        seg_p = str(tmp_path / "gt.png")
        Image.fromarray(
            (rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(img_p)
        Image.fromarray(
            rng.randint(0, 19, (64, 64)).astype(np.uint8), mode="L"
        ).save(seg_p)
        common = ["test", "--ckpt", tiny_ckpt, "--image_path", img_p,
                  "--seg_path", seg_p, "--save_dir", str(tmp_path / "inv"),
                  "--image_size", "16", "--iterations", "1",
                  "--lambda_img", "1", "--lambda_percept", "0.5",
                  "--num_steps", "4"]
        with pytest.raises(SystemExit, match="lambda_percept"):
            main(common)
        out = main(common + ["--allow_no_lpips"])  # explicit opt-out runs
        assert os.path.exists(out)


class TestTrainCli:
    def test_three_steps_synthetic(self, tmp_path):
        from fenerf_tpu.apps.train import main
        root = tmp_path / "data"
        (root / "celebahq_mask_img").mkdir(parents=True)
        (root / "celebahq_mask_mask").mkdir()
        rng = np.random.RandomState(0)
        for i in range(8):
            Image.fromarray((rng.rand(512, 512, 3) * 255).astype(np.uint8)
                            ).save(root / "celebahq_mask_img" / f"{i}.jpg")
            Image.fromarray(rng.randint(0, 19, (512, 512)).astype(np.uint8),
                            mode="L").save(
                root / "celebahq_mask_mask" / f"{i}.png")
        out = str(tmp_path / "run")
        main(["--curriculum", "CelebA_double_semantic", "--global_batch",
              "--output_dir", out, "--data_root", str(root),
              "--total_steps", "3", "--eval_freq", "0",
              "--sample_interval", "1000", "--model_save_interval", "2",
              "--log_every", "1",
              "--field_overrides",
              json.dumps({"hidden_dim": 16, "map_hidden_dim": 16}),
              "--stage_overrides",
              json.dumps({"batch_size": 8, "batch_split": 1, "img_size": 8,
                          "num_steps": 2, "latent_geo_dim": 8,
                          "latent_app_dim": 8})])
        assert os.path.exists(os.path.join(out, "train_state.npz"))
        assert os.path.exists(os.path.join(out, "generator.npz"))
        lines = open(os.path.join(out, "metrics.jsonl")).read().strip()
        assert '"g_loss"' in lines
        # regression: interval 0 means "never", not modulo-by-zero; also
        # covers --full_batch (one-program G phase over batch_split=2 chunks)
        out2 = str(tmp_path / "run0")
        main(["--curriculum", "CelebA_double_semantic", "--global_batch",
              "--output_dir", out2, "--data_root", str(root),
              "--total_steps", "1", "--eval_freq", "0",
              "--sample_interval", "0", "--model_save_interval", "0",
              "--log_every", "1", "--full_batch",
              "--field_overrides",
              json.dumps({"hidden_dim": 16, "map_hidden_dim": 16}),
              "--stage_overrides",
              json.dumps({"batch_size": 8, "batch_split": 2, "img_size": 8,
                          "num_steps": 2, "latent_geo_dim": 8,
                          "latent_app_dim": 8})])
        # completes without modulo-by-zero; the end-of-training save still
        # happens (interval 0 only disables the PERIODIC saves/samples)
        assert '"g_loss"' in open(
            os.path.join(out2, "metrics.jsonl")).read()


class TestStageTransition:
    def test_train_crosses_stage_boundary(self, tmp_path):
        """Step 0-1 at 8px/bs8 then 2-3 at 16px: recompile, dataloader
        rebuild, fade-in reset, optimizer state carry-over."""
        from fenerf_tpu.apps.train import main
        root = tmp_path / "data"
        (root / "celebahq_mask_img").mkdir(parents=True)
        (root / "celebahq_mask_mask").mkdir()
        rng = np.random.RandomState(0)
        for i in range(10):
            Image.fromarray((rng.rand(512, 512, 3) * 255).astype(np.uint8)
                            ).save(root / "celebahq_mask_img" / f"{i}.jpg")
            Image.fromarray(rng.randint(0, 19, (512, 512)).astype(np.uint8),
                            mode="L").save(
                root / "celebahq_mask_mask" / f"{i}.png")
        out = str(tmp_path / "run")
        main(["--curriculum", "smoke", "--global_batch",
              "--output_dir", out,
              "--data_root", str(root), "--total_steps", "4",
              "--eval_freq", "0", "--sample_interval", "1000",
              "--model_save_interval", "1000", "--log_every", "1",
              "--field_overrides",
              json.dumps({"hidden_dim": 16, "map_hidden_dim": 16}),
              "--stage_overrides",
              json.dumps({"latent_geo_dim": 8, "latent_app_dim": 8})])
        lines = [json.loads(l) for l in
                 open(os.path.join(out, "metrics.jsonl"))
                 if '"step"' in l]
        steps = [l["step"] for l in lines]
        assert 0 in steps and 3 in steps
        assert all(np.isfinite(l["g_loss"]) for l in lines)


class TestResume:
    def test_load_dir_resumes_step(self, tmp_path):
        from fenerf_tpu.apps.train import main
        root = tmp_path / "data"
        (root / "celebahq_mask_img").mkdir(parents=True)
        (root / "celebahq_mask_mask").mkdir()
        rng = np.random.RandomState(0)
        for i in range(8):
            Image.fromarray((rng.rand(512, 512, 3) * 255).astype(np.uint8)
                            ).save(root / "celebahq_mask_img" / f"{i}.jpg")
            Image.fromarray(rng.randint(0, 19, (512, 512)).astype(np.uint8),
                            mode="L").save(
                root / "celebahq_mask_mask" / f"{i}.png")
        out = str(tmp_path / "run")
        common = ["--curriculum", "CelebA_double_semantic", "--global_batch",
                  "--output_dir", out, "--data_root", str(root),
                  "--eval_freq", "0", "--sample_interval", "1000",
                  "--model_save_interval", "2", "--log_every", "1",
                  "--field_overrides",
                  json.dumps({"hidden_dim": 16, "map_hidden_dim": 16}),
                  "--stage_overrides",
                  json.dumps({"batch_size": 8, "batch_split": 1,
                              "img_size": 8, "num_steps": 2,
                              "latent_geo_dim": 8, "latent_app_dim": 8})]
        main(common + ["--total_steps", "2"])
        main(common + ["--total_steps", "4", "--load_dir", out])
        lines = [json.loads(l) for l in
                 open(os.path.join(out, "metrics.jsonl"))]
        steps = [l["step"] for l in lines]
        assert 2 in steps and 3 in steps  # resumed past the saved step


class TestServe:
    def test_render_server_endpoints(self, tiny_ckpt):
        """Persistent render server (apps/serve.py): one warmed program
        answers /render for rgb+seg, /meta, /healthz; bad queries are 400
        without killing the server."""
        import threading
        import urllib.request
        import urllib.error

        from fenerf_tpu.apps.serve import build_renderer, make_server

        render_np, meta = build_renderer(
            tiny_ckpt, image_size=16, num_steps=2, ray_step_multiplier=1,
            fov=12.0, fill_mode="seg_padding_background", fill_color="black",
            ray_chunk=0, use_ema=True)
        assert meta["step"] == 123 and meta["n_labels"] > 0
        srv = make_server(render_np, meta, port=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            def get(path):
                return urllib.request.urlopen(base + path, timeout=120)

            assert json.loads(get("/healthz").read())["ok"] is True
            m = json.loads(get("/meta").read())
            assert m["image_size"] == 16
            for kind in ("rgb", "seg", "depth"):
                try:
                    r = get(f"/render?seed=3&yaw=0.2&psi=0.5&kind={kind}")
                except urllib.error.HTTPError as e:
                    if kind == "depth" and e.code == 400:
                        continue  # cv2 absent -> 400, server stays alive
                    raise
                body = r.read()
                assert body[:8] == b"\x89PNG\r\n\x1a\n", kind
                assert float(r.headers["X-Render-Ms"]) > 0
            # same seed+pose renders identically (pure function of inputs)
            a = get("/render?seed=3&yaw=0.2").read()
            b = get("/render?seed=3&yaw=0.2").read()
            assert a == b
            with pytest.raises(urllib.error.HTTPError) as ei:
                get("/render?seed=notanint")
            assert ei.value.code == 400
            assert json.loads(get("/healthz").read())["ok"] is True
        finally:
            srv.shutdown()
            srv.server_close()


class TestBatchedServe:
    def test_micro_batched_server(self, tiny_ckpt):
        """--batch 4 micro-batching: concurrent requests with distinct
        seeds/poses/psis are rendered through one batch-shaped program and
        every caller gets a valid PNG (the batcher pads the tail batch and
        routes rows back to the right requests)."""
        import threading
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        from fenerf_tpu.apps.serve import build_renderer, make_server

        render_np, meta = build_renderer(
            tiny_ckpt, image_size=16, num_steps=2, ray_step_multiplier=1,
            fov=12.0, fill_mode="seg_padding_background", fill_color="black",
            ray_chunk=0, use_ema=True, batch=4, batch_wait_ms=30.0)
        assert meta["batch"] == 4
        srv = make_server(render_np, meta, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{srv.server_address[1]}"

        def get(i):
            url = (f"{base}/render?seed={i}&yaw={0.1 * i}&pitch={0.02 * i}"
                   f"&psi={0.5 + 0.1 * (i % 3)}")
            with urllib.request.urlopen(url, timeout=300) as r:
                body = r.read()
            assert body[:8] == b"\x89PNG\r\n\x1a\n", i
            return body

        # 6 concurrent requests through a batch-4 program: one full batch +
        # one padded tail batch, every caller served a valid PNG
        try:
            with ThreadPoolExecutor(max_workers=6) as ex:
                list(ex.map(get, range(6)))
        finally:
            srv.shutdown()
            srv.server_close()

        # row routing: distinct concurrent requests get distinct renders.
        # the shared tiny_ckpt renders EXACTLY zero opacity (random init,
        # relu-clamped sigma all negative), making every output identical
        # whatever the latents/camera — bump the sigma-head bias so the
        # volume is non-empty, and read the raw composite (fill_mode=None)
        import tempfile

        params, _, _, fcfg, _ = load_generator(tiny_ckpt)
        params = dict(params)
        params["sigma_head"]["b"] = params["sigma_head"]["b"] + 5.0
        dense = os.path.join(tempfile.mkdtemp(), "dense.npz")
        save_generator(dense, params, params, params,
                       "SIRENBASELINESEMANTICDISENTANGLE", step=1,
                       field_kwargs=dict(hidden_dim=fcfg.hidden_dim,
                                         map_hidden_dim=fcfg.map_hidden_dim,
                                         z_geo_dim=fcfg.z_geo_dim,
                                         z_app_dim=fcfg.z_app_dim))
        render_raw, _ = build_renderer(
            dense, image_size=16, num_steps=2, ray_step_multiplier=1,
            fov=12.0, fill_mode=None, fill_color="black",
            ray_chunk=0, use_ema=True, batch=4, batch_wait_ms=30.0)
        with ThreadPoolExecutor(max_workers=4) as ex:
            outs = list(ex.map(
                lambda i: render_raw(i, 0.1 * i, 0.0, 0.7)[0], range(4)))
        assert any(np.abs(outs[0] - o).max() > 1e-6 for o in outs[1:])


class TestShardRays:
    def test_multiview_shard_rays_bit_equal(self, tiny_ckpt, tmp_path):
        """--shard_rays splits one image's rays over the 8 virtual devices;
        ray gen + all RNG draws happen outside the shard_map with
        render_core's key structure, so the PNG must be BYTE-identical to
        the unsharded render (VERDICT r3 missing #5)."""
        from fenerf_tpu.apps.render_multiview import main
        base = ["--ckpt", tiny_ckpt, "--seeds", "3", "--image_size", "16",
                "--num_steps", "4", "--ray_step_multiplier", "2",
                "--ray_chunk", "0"]
        out_a, out_b = str(tmp_path / "plain"), str(tmp_path / "shard")
        main(base + ["--output_dir", out_a])
        main(base + ["--output_dir", out_b, "--shard_rays"])
        a = open(os.path.join(out_a, "img_3.png"), "rb").read()
        b = open(os.path.join(out_b, "img_3.png"), "rb").read()
        assert a == b

    def test_render_video_shard_rays_bit_equal(self, tiny_ckpt, tmp_path):
        """render_video --shard_rays (round-4 verdict Next #8): trajectory
        frames are deterministic-camera renders, so each saved frame PNG must
        be byte-identical to the unsharded run's."""
        from fenerf_tpu.apps.render_video import main
        base = ["--ckpt", tiny_ckpt, "--seeds", "0", "--image_size", "16",
                "--num_steps", "4", "--num_frames", "2", "--trajectory",
                "front", "--latent_type", "geo", "--ray_chunk", "0",
                "--save_frames"]
        out_a, out_b = str(tmp_path / "plain"), str(tmp_path / "shard")
        main(base + ["--output_dir", out_a])
        main(base + ["--output_dir", out_b, "--shard_rays"])
        frames = [f for f in sorted(os.listdir(out_a)) if f.endswith(".png")]
        assert len(frames) == 2
        for f in frames:
            a = open(os.path.join(out_a, f), "rb").read()
            b = open(os.path.join(out_b, f), "rb").read()
            assert a == b, f

    def test_extract_shapes_shard_equal(self, tiny_ckpt, tmp_path):
        from fenerf_tpu.apps.extract_shapes import main
        base = ["--ckpt", tiny_ckpt, "--seeds", "0",
                "--voxel_resolution", "16", "--chunk", "512"]
        out_a, out_b = str(tmp_path / "plain"), str(tmp_path / "shard")
        main(base + ["--output_dir", out_a])
        main(base + ["--output_dir", out_b, "--shard_rays"])
        a = np.fromfile(os.path.join(out_a, "shape_seed0.mrc"),
                        dtype=np.float32)[256:]
        b = np.fromfile(os.path.join(out_b, "shape_seed0.mrc"),
                        dtype=np.float32)[256:]
        np.testing.assert_allclose(a, b, atol=2e-6)
