"""Live viewer (headless pangolin replacement): HTTP endpoints serve the
latest mesh, preview render and status."""

import json
import urllib.request

import numpy as np

from bnv_fusion_tpu.mesh import Mesh, load_ply
from bnv_fusion_tpu.utils.live_viewer import LiveViewer


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=5) as r:
        return r.status, r.read()


def test_live_viewer_endpoints(tmp_path):
    viewer = LiveViewer(port=0)
    try:
        code, body = _get(viewer.port, "/")
        assert code == 200 and b"live reconstruction" in body
        # nothing published yet
        try:
            code, _ = _get(viewer.port, "/mesh.ply")
        except urllib.error.HTTPError as e:  # noqa: F841
            code = e.code
        assert code == 404

        tri = Mesh(
            np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
            np.array([[0, 1, 2]], np.int32))
        viewer.publish(tri, status={"frames": 7})

        code, ply = _get(viewer.port, "/mesh.ply")
        assert code == 200
        p = tmp_path / "got.ply"
        p.write_bytes(ply)
        back = load_ply(str(p))
        np.testing.assert_allclose(back.vertices, tri.vertices)

        code, st = _get(viewer.port, "/status.json")
        st = json.loads(st)
        assert st["frames"] == 7 and st["vertices"] == 3

        code, png = _get(viewer.port, "/preview.png")
        assert code == 200 and png[:4] == b"\x89PNG"
    finally:
        viewer.close()
