"""Native (C++) OBJ parser vs the pure-Python reference parser."""
import os
import textwrap

import numpy as np
import pytest

from cython3dmodelrenderer_tpu.models import obj_io
from cython3dmodelrenderer_tpu.native import objparse_native

pytestmark = pytest.mark.skipif(not objparse_native.available(),
                                reason="native parser unavailable (no g++?)")

ASSETS = os.environ.get("CRENDER_OBJECTS", "/root/reference/objects")
# vendored fallbacks (repo stands alone without the reference mount)
VENDORED = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets")


def assert_same_parse(path):
    py = obj_io._load_obj_python(path)
    nat = obj_io._try_native(path, silent=True, external_texture_filename=None)
    assert nat is not None
    np.testing.assert_array_equal(nat.vertices, py.vertices)
    np.testing.assert_array_equal(nat.faces_v, py.faces_v)
    if py.normals is None:
        assert nat.normals is None or len(nat.normals) == 0 or nat.faces_vn is None
    else:
        np.testing.assert_array_equal(nat.normals, py.normals)
    if py.faces_vn is None:
        assert nat.faces_vn is None
    else:
        np.testing.assert_array_equal(nat.faces_vn, py.faces_vn)
    if py.faces_vt is None:
        assert nat.faces_vt is None
    else:
        np.testing.assert_array_equal(nat.faces_vt, py.faces_vt)
        np.testing.assert_allclose(nat.texture_coords, py.texture_coords)
    if py.texture is None:
        assert nat.texture is None
    else:
        np.testing.assert_array_equal(nat.texture, py.texture)


@pytest.mark.parametrize("name", ["cube.obj", "Cube2.obj", "basketball.obj",
                                  "bunny.obj", "T-Rex.obj",
                                  "igor_sphere.obj"])
def test_reference_assets(name):
    path = os.path.join(ASSETS, name)
    if not os.path.exists(path):
        path = os.path.join(VENDORED, name)   # committed fallback
    if not os.path.exists(path):
        pytest.skip("asset missing")
    assert_same_parse(path)


def test_edge_cases(tmp_path):
    path = tmp_path / "edge.obj"
    path.write_text(textwrap.dedent("""\
        # comment
        v 0 0 0
        v 1 0 0 7.5
        v 1 1 0
        v 0 1 0
        v 0 0 1
        vbroken line
        v oops nan_token x
        f 1 2 3 4 5
        f -3 -2 -1
        f 1 2
    """))
    assert_same_parse(str(path))


def test_negative_and_mixed_face_forms(tmp_path):
    path = tmp_path / "mix.obj"
    path.write_text(textwrap.dedent("""\
        v 0 0 0
        v 1 0 0
        v 1 1 0
        vn 0 0 1
        vn 0 1 0
        vn 1 0 0
        f 1//1 2//2 3//3
        f 1//1 2//2 -1//-1
    """))
    assert_same_parse(str(path))


def test_partial_vt_drop(tmp_path):
    path = tmp_path / "pvt.obj"
    path.write_text(textwrap.dedent("""\
        v 0 0 0
        v 1 0 0
        v 1 1 0
        vt 0 0
        vt 1 0
        vt 1 1
        f 1/1 2/2 3/3
        f 1 2 3
    """))
    assert_same_parse(str(path))


def test_native_used_by_default(trex_path):
    # load_obj prefers the native parser when available
    data = obj_io.load_obj(trex_path)
    assert data.faces_v.shape == (13814, 3)
    assert data.texture is not None


def test_native_speed():
    import time

    path = os.path.join(ASSETS, "bunny.obj")  # 30k faces, no texture decode
    if not os.path.exists(path):
        pytest.skip("asset missing")
    t0 = time.perf_counter()
    obj_io._load_obj_python(path)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    obj_io._try_native(path, silent=True, external_texture_filename=None)
    t_nat = time.perf_counter() - t0
    # the native line loop should be at least 5x faster than pure Python
    assert t_nat < t_py / 5, (t_nat, t_py)


def test_extra_face_components(tmp_path):
    """Corner components past the third are ignored regardless of content
    (python parity: ``(comp + "//").split("/")[:3]``), empty vt/vn after a
    slash are absent, and malformed first-three components drop the line —
    identically in both parsers."""
    path = tmp_path / "extra.obj"
    path.write_text(textwrap.dedent("""\
        v 0 0 0
        v 1 0 0
        v 1 1 0
        v 0 1 0
        vt 0 0
        vt 1 0
        vt 1 1
        vn 0 0 1
        f 1/1/1/9 2/2/1/9 3/3/1/9
        f 1/1/ 2/2/ 3/3/
        f 1// 2// 3//
        f 1/2/1/xyz 2/3/1/abc 3/1/1/!!
        f 1/2/1/ 2/3/1/ 3/1/1/
        f 1/x 2/2 3/3
        f 1/2/1x 2/2 3/3
        f 2 3 4
        """))
    assert_same_parse(str(path))
