"""Irawan-Marschner woven cloth tests (reference: src/bsdfs/irawan.{h,cpp})."""
import numpy as np
import pytest

import jax.numpy as jnp

from mitsuba_tpu.core import rng as rng_mod
from mitsuba_tpu.core import warp as W
from mitsuba_tpu.render import bsdf as B
from mitsuba_tpu.render import irawan as IW
from mitsuba_tpu.utils.chi2 import chi2_test


def _locals(n, uv, ks=(0.4,) * 3, kd=(0.3,) * 3, name="plain"):
    tab = IW.build_table([IW.preset(name, kd=kd, ks=ks)], [(8.0, 8.0)])
    par, ksv, kdv = IW.lane_params(tab, jnp.zeros(n, jnp.int32), uv)
    return IW._norm_locals(n, par)._replace(iw_ks=ksv, albedo=kdv)


@pytest.mark.parametrize("name", ["plain", "twill"])
def test_irawan_energy_normalized(name):
    """configure()'s MC normalization makes the average specular
    reflectance equal ks (max channel), so directional-hemispherical
    albedo under diffuse illumination ~= kd + ks (irawan.cpp:138-171)."""
    n = 1 << 16
    rng = np.random.default_rng(3)
    uv = jnp.asarray(rng.random((n, 2), np.float32))
    bl = _locals(n, uv, name=name)
    wi = W.square_to_cosine_hemisphere(jnp.asarray(rng.random((n, 2), np.float32)))
    wo = W.square_to_cosine_hemisphere(jnp.asarray(rng.random((n, 2), np.float32)))
    f = B._irawan_eval(bl, wi, wo)
    assert bool(jnp.isfinite(f).all())
    rho = float((f[..., 0] / jnp.maximum(wo[..., 2], 1e-6)).mean() * np.pi)
    assert abs(rho - 0.7) < 0.12, rho   # kd 0.3 + ks 0.4


def test_irawan_anisotropic_highlights():
    """Cloth is anisotropic: rotating wo in azimuth at fixed polar angle
    must change the specular response (warp vs weft highlight bands)."""
    n = 1 << 14
    rng = np.random.default_rng(4)
    uv = jnp.asarray(rng.random((n, 2), np.float32))
    bl = _locals(n, uv)
    th_i, th_o = 0.5, 0.6
    wi = jnp.broadcast_to(jnp.asarray(
        [np.sin(th_i), 0.0, np.cos(th_i)], jnp.float32), (n, 3))
    vals = []
    for phi in (0.0, np.pi / 2):
        wo = jnp.broadcast_to(jnp.asarray(
            [np.sin(th_o) * np.cos(phi), np.sin(th_o) * np.sin(phi),
             np.cos(th_o)], jnp.float32), (n, 3))
        vals.append(float(B._irawan_eval(bl, wi, wo)[..., 0].mean()))
    assert abs(vals[0] - vals[1]) > 0.02 * max(vals), vals


def test_irawan_chi2():
    """sample() draws from the density claimed by pdf() (cosine lobe,
    irawan.cpp sample:338-370) — chi-square over the sphere."""
    n_uv = jnp.asarray([[0.37, 0.81]], jnp.float32)

    def sample_fn(n):
        uv = jnp.broadcast_to(n_uv, (n, 2))
        bl = _locals(n, uv)
        wi = jnp.broadcast_to(jnp.asarray([0.3, 0.1, 0.95], jnp.float32), (n, 3))
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        u = rng_mod.uniform4(7, jnp.arange(n, dtype=jnp.int32), 0, 0)
        bs = B.sample(bl, wi, u[..., 0], u[..., 1:3],
                      active_types=(B.IRAWAN,))
        ok = (bs.pdf > 0) & ~bs.is_delta
        return np.where(np.asarray(ok)[:, None], np.asarray(bs.wo), 0.0)

    def pdf_fn(d):
        n = d.shape[0]
        uv = jnp.broadcast_to(n_uv, (n, 2))
        bl = _locals(n, uv)
        wi = jnp.broadcast_to(jnp.asarray([0.3, 0.1, 0.95], jnp.float32), (n, 3))
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        return B.pdf(bl, wi, d, active_types=(B.IRAWAN,))

    ok, pval, stat, dof, info = chi2_test(
        sample_fn, pdf_fn, n_samples=200_000, significance=0.0005)
    assert ok, info


def test_cloth_file_roundtrip(tmp_path):
    """The reference .cloth grammar parses (irawan.h:340-395): pattern
    grid, yarn blocks with degree angles, kd/ks triples."""
    txt = """/* test weave */
weave {
  name = "denim",
  tileWidth = 3, tileHeight = 3,
  alpha = 0.01, beta = 4.0, ss = 0.5, hWidth = 0.5,
  warpArea = 0.7, weftArea = 0.3,
  pattern { 1, 2, 2,  2, 1, 2,  2, 2, 1 },
  yarn { type = warp, psi = 0, umax = 38, kappa = 1.0,
         width = 1, length = 3, centerU = 0.5, centerV = 0.5,
         kd = {0.1, 0.2, 0.5}, ks = {0.2, 0.3, 0.6} },
  yarn { type = weft, psi = 30, umax = 30, kappa = 0.5,
         width = 1, length = 2, centerU = 0.5, centerV = 0.5,
         kd = {0.5, 0.5, 0.6}, ks = {0.4, 0.4, 0.5} }
}
"""
    p = tmp_path / "denim.cloth"
    p.write_text(txt)
    pd = IW.load_cloth(str(p))
    assert pd["tileWidth"] == 3 and len(pd["yarns"]) == 2
    assert pd["pattern"] == [1, 2, 2, 2, 1, 2, 2, 2, 1]
    assert abs(pd["yarns"][0]["umax"] - 38 * np.pi / 180) < 1e-6
    assert pd["yarns"][0]["kd"] == (0.1, 0.2, 0.5)
    # trailing spectrum field: the yarn-body capture must be brace-aware or
    # a block ending with a {r,g,b} tuple silently truncates to the default
    assert pd["yarns"][0]["ks"] == (0.2, 0.3, 0.6)
    assert pd["yarns"][1]["ks"] == (0.4, 0.4, 0.5)
    tab = IW.build_table([pd], [(5.0, 5.0)])
    assert float(tab.spec_norm[0]) > 0


def test_irawan_render_endtoend(tmp_path):
    """XML <bsdf type="irawan"> renders: a cloth plane under a point
    light produces finite, positive, kd-dominated radiance."""
    from mitsuba_tpu.io.mitsuba_xml import load_scene
    from mitsuba_tpu.render import api

    xml = tmp_path / "cloth.xml"
    xml.write_text("""<scene version="0.6.0">
  <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
  <sensor type="perspective">
    <float name="fov" value="40"/>
    <transform name="toWorld">
      <lookat origin="0, 0.6, -1.2" target="0, 0, 0" up="0, 1, 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="16"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="12"/><integer name="height" value="12"/>
    </film>
  </sensor>
  <shape type="rectangle">
    <transform name="toWorld"><rotate x="1" angle="-90"/></transform>
    <bsdf type="irawan">
      <string name="preset" value="twill"/>
      <rgb name="kd" value="0.4, 0.2, 0.1"/>
      <rgb name="ks" value="0.3, 0.3, 0.3"/>
      <float name="repeatU" value="20"/>
      <float name="repeatV" value="20"/>
    </bsdf>
  </shape>
  <emitter type="point">
    <point name="position" x="0.5" y="1.2" z="-0.5"/>
    <rgb name="intensity" value="6, 6, 6"/>
  </emitter>
</scene>""")
    ls = load_scene(str(xml))
    img = np.asarray(api.render(ls.scene, ls.static, ls.sensor,
                                ls.integrator, ls.settings))
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3
    assert img[..., 0].mean() > img[..., 2].mean()  # kd red-dominant
