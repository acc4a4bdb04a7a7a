"""IO tests: image formats, mesh loaders, XML scene pipeline."""
import os

import numpy as np
import pytest

from mitsuba_tpu.io import image as I
from mitsuba_tpu.io import mesh as M


def test_exr_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(0, 4, (13, 17, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    I.write_exr(p, img)
    back = I.read_exr(p)
    np.testing.assert_array_equal(back, img)


def test_pfm_roundtrip(tmp_path):
    img = np.random.default_rng(1).uniform(0, 4, (9, 11, 3)).astype(np.float32)
    p = str(tmp_path / "t.pfm")
    I.write_pfm(p, img)
    np.testing.assert_array_equal(I.read_pfm(p), img)


def test_png_write(tmp_path):
    img = np.random.default_rng(2).uniform(0, 1, (8, 8, 3)).astype(np.float32)
    p = str(tmp_path / "t.png")
    I.write_png(p, img)
    assert os.path.getsize(p) > 0


def test_obj_loader(tmp_path):
    p = str(tmp_path / "tri.obj")
    with open(p, "w") as f:
        f.write("""v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0
vn 0 0 1\nvt 0 0\nvt 1 0\nvt 0 1\nvt 1 1
f 1/1/1 2/2/1 3/3/1\nf 2/2/1 4/4/1 3/3/1\n""")
    mesh = M.load_obj(p)[0]
    assert mesh.positions.shape == (4, 3)
    assert mesh.faces.shape == (2, 3)
    assert mesh.normals is not None and mesh.uvs is not None
    np.testing.assert_allclose(mesh.normals, [[0, 0, 1]] * 4)


def test_ply_ascii_and_binary(tmp_path):
    pa = str(tmp_path / "t.ply")
    with open(pa, "w") as f:
        f.write("""ply
format ascii 1.0
element vertex 3
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
0 1 0
3 0 1 2
""")
    mesh = M.load_ply(pa)
    assert mesh.positions.shape == (3, 3) and mesh.faces.shape == (1, 3)

    pb = str(tmp_path / "tb.ply")
    verts = np.array([(0, 0, 0), (1, 0, 0), (0, 1, 0)],
                     dtype=np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4")]))
    with open(pb, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n"
                b"element vertex 3\nproperty float x\nproperty float y\n"
                b"property float z\nelement face 1\n"
                b"property list uchar int vertex_indices\nend_header\n")
        f.write(verts.tobytes())
        f.write(np.uint8(3).tobytes())
        f.write(np.array([0, 1, 2], "<i4").tobytes())
    mesh2 = M.load_ply(pb)
    np.testing.assert_allclose(mesh2.positions, mesh.positions)
    np.testing.assert_array_equal(mesh2.faces, mesh.faces)


def test_serialized_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    mesh = M.MeshData(
        positions=rng.uniform(-1, 1, (100, 3)),
        faces=rng.integers(0, 100, (50, 3)),
        normals=rng.normal(size=(100, 3)),
        uvs=rng.uniform(0, 1, (100, 2)),
        name="testmesh",
    )
    p = str(tmp_path / "t.serialized")
    M.save_serialized(p, [mesh, mesh])
    back = M.load_serialized(p, 1)
    np.testing.assert_allclose(back.positions, mesh.positions)
    np.testing.assert_array_equal(back.faces, mesh.faces)
    np.testing.assert_allclose(back.normals, mesh.normals)
    np.testing.assert_allclose(back.uvs, mesh.uvs)
    assert back.name == "testmesh"


def test_xml_cbox_loads_and_renders():
    """End-to-end: reference-syntax Cornell box XML -> compiled scene ->
    8x8 render with sane radiometry."""
    from mitsuba_tpu.io.mitsuba_xml import load_scene
    from mitsuba_tpu.render import api

    here = os.path.join(os.path.dirname(__file__), "..", "scenes", "cbox.xml")
    ls = load_scene(here, defines={"spp": 4, "res": 8})
    assert ls.settings.width == 8 and ls.settings.spp == 4
    assert ls.static.n_tris > 10
    assert ls.static.n_spheres == 1
    img = np.asarray(api.render(ls.scene, ls.static, ls.sensor, ls.integrator,
                                ls.settings))
    assert np.isfinite(img).all()
    assert img.mean() > 0.05, img.mean()   # lit scene
    assert img.max() < 50.0                # no fireworks


def test_image_writer_formats(tmp_path):
    """Bitmap writer coverage (bitmap.h:182-269 formats): RGBE round-trips
    HDR data; PPM/TGA/BMP write valid LDR files."""
    from mitsuba_tpu.io import image as im

    img = np.random.default_rng(0).random((12, 16, 3)).astype(np.float32) * 4.0
    p = str(tmp_path / "t.hdr")
    im.write_rgbe(p, img)
    back = im.read_rgbe(p)
    assert np.allclose(back, img, rtol=0.01, atol=0.02), np.abs(back - img).max()
    for ext in ("ppm", "tga", "bmp"):
        q = str(tmp_path / f"t.{ext}")
        im.write_image(q, np.clip(img / 4.0, 0, 1))
        assert (tmp_path / f"t.{ext}").stat().st_size > 100


def test_xml_include(tmp_path):
    """<include> pulls another scene file's declarations in place
    (scene.cpp:522-552)."""
    (tmp_path / "inc.xml").write_text(
        '<scene version="0.5.0">'
        '<shape type="sphere"><float name="radius" value="0.5"/></shape>'
        "</scene>")
    (tmp_path / "main.xml").write_text(
        '<scene version="0.5.0">'
        '<include filename="inc.xml"/>'
        '<emitter type="constant"><spectrum name="radiance" value="1"/></emitter>'
        "</scene>")
    from mitsuba_tpu.io.mitsuba_xml import load_scene

    ls = load_scene(str(tmp_path / "main.xml"))
    assert ls.static.n_spheres == 1


def test_cli_multi_scene_jobs(tmp_path):
    """CLI -j renders several scenes concurrently and matches the
    sequential render bit-for-bit (mitsuba.cpp:223-227 P5 parity; the
    per-(pixel,sample) counter RNG makes scheduling irrelevant)."""
    import shutil

    from mitsuba_tpu.__main__ import main

    src = os.path.join(os.path.dirname(__file__), "..", "scenes", "cbox.xml")
    a = tmp_path / "a.xml"
    b = tmp_path / "b.xml"
    shutil.copy(src, a)
    shutil.copy(src, b)
    args = ["-D", "spp=2", "-D", "res=8", "-p", "1", "-z", "-L", "error"]
    assert main([str(a), str(b), "-j", "2"] + args) == 0
    assert (tmp_path / "a.exr").exists() and (tmp_path / "b.exr").exists()
    par = I.read_exr(str(tmp_path / "a.exr"))
    (tmp_path / "a.exr").unlink()
    assert main([str(a)] + args) == 0
    seq = I.read_exr(str(tmp_path / "a.exr"))
    np.testing.assert_array_equal(par, seq)


_DAE = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><up_axis>Z_UP</up_axis></asset>
  <library_effects>
    <effect id="fx-red"><profile_COMMON><technique sid="common">
      <lambert><diffuse><color>0.8 0.1 0.1 1</color></diffuse></lambert>
    </technique></profile_COMMON></effect>
  </library_effects>
  <library_materials>
    <material id="mat-red"><instance_effect url="#fx-red"/></material>
  </library_materials>
  <library_geometries>
    <geometry id="quad"><mesh>
      <source id="quad-pos">
        <float_array id="quad-pos-arr" count="12">
          -1 -1 0  1 -1 0  1 1 0  -1 1 0</float_array>
        <technique_common><accessor source="#quad-pos-arr" count="4"
          stride="3"/></technique_common>
      </source>
      <source id="quad-nrm">
        <float_array id="quad-nrm-arr" count="3">0 0 1</float_array>
        <technique_common><accessor source="#quad-nrm-arr" count="1"
          stride="3"/></technique_common>
      </source>
      <vertices id="quad-vtx"><input semantic="POSITION"
        source="#quad-pos"/></vertices>
      <polylist material="m0" count="1">
        <input semantic="VERTEX" source="#quad-vtx" offset="0"/>
        <input semantic="NORMAL" source="#quad-nrm" offset="1"/>
        <vcount>4</vcount>
        <p>0 0 1 0 2 0 3 0</p>
      </polylist>
    </mesh></geometry>
  </library_geometries>
  <library_lights>
    <light id="sun"><technique_common><point>
      <color>30 30 30</color></point></technique_common></light>
  </library_lights>
  <library_cameras>
    <camera id="cam"><optics><technique_common><perspective>
      <yfov>45</yfov></perspective></technique_common></optics></camera>
  </library_cameras>
  <library_visual_scenes>
    <visual_scene id="vs">
      <node id="n1">
        <translate>0 0 2</translate>
        <rotate>1 0 0 90</rotate>
        <instance_geometry url="#quad">
          <bind_material><technique_common>
            <instance_material symbol="m0" target="#mat-red"/>
          </technique_common></bind_material>
        </instance_geometry>
      </node>
      <node id="n2"><translate>0 -3 2</translate>
        <instance_light url="#sun"/></node>
      <node id="n3">
        <matrix>1 0 0 0  0 0 -1 -3  0 1 0 2  0 0 0 1</matrix>
        <instance_camera url="#cam"/>
      </node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#vs"/></scene>
</COLLADA>
"""


def test_mtsimport_collada_roundtrip(tmp_path):
    """mtsimport parity (src/converter/collada.cpp): a COLLADA scene with
    a Z-up polylist quad, bound material, node transforms, and a point
    light converts to scene XML + .serialized that loads and renders."""
    from mitsuba_tpu.io.collada import convert
    from mitsuba_tpu.io.mitsuba_xml import load_scene
    from mitsuba_tpu.render import api

    dae = tmp_path / "scene.dae"
    dae.write_text(_DAE)
    out = tmp_path / "scene.xml"
    convert(str(dae), str(out), spp=4, size=(8, 8))
    assert out.exists() and (tmp_path / "scene.serialized").exists()

    ls = load_scene(str(out))
    assert ls.static.n_tris == 2          # quad fan-triangulated
    img = np.asarray(api.render(ls.scene, ls.static, ls.sensor,
                                ls.integrator, ls.settings))
    assert np.isfinite(img).all()
    # the red diffuse quad lit by the point light: red mean dominates
    assert img[..., 0].mean() > img[..., 1].mean() * 2
    assert img[..., 0].mean() > 1e-4


def test_mtsimport_obj_cli(tmp_path):
    """mtsimport OBJ mode writes serialized + XML wrapper that loads."""
    from mitsuba_tpu import mtsimport
    from mitsuba_tpu.io.mitsuba_xml import load_scene

    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    out = tmp_path / "tri.xml"
    assert mtsimport.main([str(obj), str(out), "-r", "8x8", "-s", "2"]) == 0
    ls = load_scene(str(out))
    assert ls.static.n_tris == 1


def test_mtsutil_rdielprec(tmp_path):
    """rdielprec utility (src/utils role): precomputes rough-transmittance
    tables; T must rise with cos and fall with alpha."""
    from mitsuba_tpu import mtsutil

    out = tmp_path / "rt.npz"
    assert mtsutil.main(["rdielprec", "--alpha", "0.1", "0.5",
                         "--eta", "1.5", "-o", str(out)]) == 0
    z = np.load(out)
    t_lo = z["beckmann_a0.1_eta1.5"]
    t_hi = z["beckmann_a0.5_eta1.5"]
    assert t_lo[-1] > t_lo[5]            # more transmission at normal inc.
    # normal incidence ~ smooth Fresnel transmittance 1 - F(1.5) = 0.96
    assert abs(t_lo[-1] - 0.96) < 0.02 and abs(t_hi[-1] - 0.96) < 0.02
    # roughness raises grazing transmittance (facet normals tilt toward
    # the ray, cutting the grazing Fresnel spike — rtrans.h table shape)
    assert t_hi[3] > t_lo[3]


def test_mtsutil_preview_progressive(tmp_path):
    """Progressive VPL preview utility — the headless analog of the
    libhw/mtsgui GL preview (preview.h:34 VPLSceneManager role): each pass
    rewrites the output and the accumulated image stays finite."""
    import os
    from mitsuba_tpu import mtsutil

    out = str(tmp_path / "p.png")
    scene = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scenes", "cbox.xml")
    rc = mtsutil.preview([scene, "-o", out, "--passes", "2",
                          "--size", "32", "-D", "res=32", "-D", "spp=4"])
    assert rc == 0 and os.path.exists(out)
    from mitsuba_tpu.io.mitsuba_xml import _load_image
    img = _load_image(out)
    assert img.shape[0] == 32 and np.isfinite(img).all() and img.mean() > 0
