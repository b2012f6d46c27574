"""Browser mask editor (apps/paint_ui.py): HTTP surface + edit->save loop.

The reference workflow (Painter/run_UI.py): load mask -> edit -> save ->
re-invert. Here the same loop is exercised headlessly over the HTTP API the
canvas JS uses."""
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from fenerf_tpu.apps.paint_ui import apply_op, make_server


@pytest.fixture()
def server(tmp_path):
    mask = np.zeros((16, 16), np.uint8)
    mask[4:12, 4:12] = 1   # skin square
    mask[6:8, 6:8] = 4     # left eye
    src = str(tmp_path / "mask.png")
    out = str(tmp_path / "mask_edit.png")
    Image.fromarray(mask, mode="L").save(src)
    srv, state = make_server(src, out, port=0,  # ephemeral port
                             log_path=str(tmp_path / "sess.editlog.npz"))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", state, out, mask
    srv.shutdown()
    srv.server_close()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def _post(url, payload):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.read()


class TestPaintUI:
    def test_page_and_labels(self, server):
        base, state, out, mask = server
        page = _get(base + "/").decode()
        assert "FENeRF mask painter" in page and "__PALETTE__" not in page
        d = json.loads(_get(base + "/labels"))
        assert d["w"] == d["h"] == 16
        np.testing.assert_array_equal(
            np.asarray(d["labels"], np.uint8).reshape(16, 16), mask)

    def test_edit_save_roundtrip(self, server):
        base, state, out, mask = server
        edited = mask.copy()
        edited[0:2, 0:2] = 13  # paint hair in the corner
        msg = _post(base + "/save",
                    {"labels": edited.reshape(-1).tolist()}).decode()
        assert "saved" in msg
        reread = np.asarray(Image.open(out))
        np.testing.assert_array_equal(reread, edited)

    def test_server_op_switch(self, server):
        base, state, out, mask = server
        d = json.loads(_post(base + "/op", {
            "op": "switch:1,13", "labels": mask.reshape(-1).tolist()}))
        got = np.asarray(d["labels"], np.uint8).reshape(16, 16)
        assert (got == 13).sum() == (mask == 1).sum()
        assert (got == 1).sum() == 0
        assert "applied" in d["msg"]

    def test_server_op_error_is_reported(self, server):
        base, state, out, mask = server
        d = json.loads(_post(base + "/op", {
            "op": "bogus:1", "labels": mask.reshape(-1).tolist()}))
        assert "error" in d["msg"]

    def test_edit_log_to_video(self, server, tmp_path):
        # edit twice -> save -> replay the session log to mp4 (the
        # reference Painter/converter_log_to_video.py workflow)
        base, state, out, mask = server
        e1 = mask.copy(); e1[0:2, 0:2] = 13
        e2 = e1.copy(); e2[14:16, 14:16] = 17
        _post(base + "/log", {"labels": e1.reshape(-1).tolist()})
        _post(base + "/log", {"labels": e2.reshape(-1).tolist()})
        _post(base + "/save", {"labels": e2.reshape(-1).tolist()})
        log = str(tmp_path / "sess.editlog.npz")
        frames = np.load(log)["frames"]
        assert frames.shape == (4, 16, 16)  # initial + 2 edits + save
        np.testing.assert_array_equal(frames[0], mask)
        np.testing.assert_array_equal(frames[-1], e2)

        from fenerf_tpu.apps import edit_log_video

        side = str(tmp_path / "side.png")
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(side)
        mp4 = str(tmp_path / "sess.mp4")
        edit_log_video.main(["--log", log, "--out", mp4, "--side", side,
                             "--fps", "2", "--hold", "2"])
        import os

        assert os.path.getsize(mp4) > 0

    def test_apply_op_grammar(self):
        m = np.zeros((8, 8), np.uint8)
        m[2:6, 2:6] = 3
        removed = apply_op(m, "remove:3")   # fills with skin (reference
        assert (removed == 3).sum() == 0    # rm_semantic semantics)
        assert (removed == 1).sum() == 16
        sw = apply_op(m, "switch:3,5")
        assert (sw == 5).sum() == 16 and (sw == 3).sum() == 0
        grown = apply_op(m, "scale:3,1.5")
        assert (grown == 3).sum() > 16
