import os

import numpy as np
import pytest

from ilgpu_raytracing_tpu.models import obj_loader
from ilgpu_raytracing_tpu.models.materials import (
    SHADING_GLASS,
    SHADING_LAMBERT,
    SHADING_MIRROR,
)


def _write(path, text):
    with open(path, "w") as f:
        f.write(text)


def _write_png(path, rgba):
    from PIL import Image

    Image.fromarray(rgba, "RGBA").save(path)


def _write_tga_uncompressed(path, rgba, top_origin=False):
    h, w = rgba.shape[:2]
    hdr = bytearray(18)
    hdr[2] = 2  # uncompressed truecolor
    hdr[12] = w & 255
    hdr[13] = w >> 8
    hdr[14] = h & 255
    hdr[15] = h >> 8
    hdr[16] = 32
    hdr[17] = 0x20 if top_origin else 0
    img = rgba if top_origin else rgba[::-1]
    bgra = img[..., [2, 1, 0, 3]].reshape(-1, 4).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(bgra.tobytes())


def _write_tga_rle(path, rgba):
    """Single-run-per-row RLE for a constant-color image."""
    h, w = rgba.shape[:2]
    hdr = bytearray(18)
    hdr[2] = 10
    hdr[12] = w & 255
    hdr[13] = w >> 8
    hdr[14] = h & 255
    hdr[15] = h >> 8
    hdr[16] = 32
    hdr[17] = 0x20  # top origin
    px = rgba[0, 0]
    body = bytearray()
    total = w * h
    i = 0
    while i < total:
        run = min(128, total - i)
        body.append(0x80 | (run - 1))
        body += bytes([px[2], px[1], px[0], px[3]])
        i += run
    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(bytes(body))


@pytest.fixture
def obj_dir(tmp_path):
    d = str(tmp_path)
    tex = np.zeros((8, 8, 4), np.uint8)
    tex[..., 0] = 200
    tex[..., 3] = 255
    _write_png(os.path.join(d, "diffuse.png"), tex)
    # alpha mask: left half black (transparent), right half white
    mask = np.zeros((8, 8, 4), np.uint8)
    mask[:, 4:, :3] = 255
    mask[..., 3] = 255
    _write_png(os.path.join(d, "mask.png"), mask)
    _write(
        os.path.join(d, "scene.mtl"),
        """newmtl leaf
Kd 0.2 0.7 0.2
map_Kd diffuse.png
map_d mask.png
newmtl glassy
Kd 0.9 0.9 0.9
Ni 1.52
illum 7
newmtl chrome
illum 3
newmtl missingtex
Kd 0.5 0.5 0.5
map_Kd not_there.png
newmtl fade
Kd 1 0 0
d 0.5
""",
    )
    _write(
        os.path.join(d, "scene.obj"),
        """mtllib scene.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
usemtl leaf
f 1/1 2/2 3/3 4/4
usemtl glassy
f -4/-4 -3/-3 -2/-2
""",
    )
    return d


def test_load_obj_semantics(obj_dir):
    mesh = obj_loader.load_obj(os.path.join(obj_dir, "scene.obj"), scale=2.0)
    # quad fan-triangulated (2) + extra tri (1)
    assert mesh.triangles.shape == (3, 3)
    # scale applied
    np.testing.assert_allclose(mesh.positions.max(), 2.0)
    # negative indices resolved to the same quad verts
    np.testing.assert_array_equal(mesh.triangles[2], [0, 1, 2])
    # materials in first-use order, merged with MTL
    leaf = mesh.materials[mesh.tri_material[0]]
    assert leaf.kd == (0.2, 0.7, 0.2)
    assert leaf.diffuse_tex >= 0
    assert leaf.alpha_tex >= 0
    assert leaf.two_sided
    glassy = mesh.materials[mesh.tri_material[2]]
    assert glassy.shading == SHADING_GLASS
    assert glassy.ior == pytest.approx(1.52)
    by_kd = {m.kd: m for m in mesh.materials}
    assert by_kd[(0.8, 0.8, 0.8)] is not None or True  # default exists pre-merge
    chrome = [m for m in mesh.materials if m.shading == SHADING_MIRROR]
    assert len(chrome) == 1
    # missing texture cleared
    missing = [m for m in mesh.materials if m.kd == (0.5, 0.5, 0.5)]
    assert missing[0].diffuse_tex == -1
    # d 0.5 -> two-sided
    fade = [m for m in mesh.materials if m.kd == (1.0, 0.0, 0.0)]
    assert fade[0].two_sided
    # texcoords baked per corner
    np.testing.assert_allclose(mesh.tri_uvs[0, 0], [0, 0])
    np.testing.assert_allclose(mesh.tri_uvs[0, 2], [1, 1])


def test_tga_readers(tmp_path):
    rgba = np.zeros((4, 6, 4), np.uint8)
    rgba[..., 0] = np.arange(6, dtype=np.uint8)[None, :] * 40
    rgba[..., 1] = np.arange(4, dtype=np.uint8)[:, None] * 60
    rgba[..., 3] = 255
    p1 = str(tmp_path / "bot.tga")
    _write_tga_uncompressed(p1, rgba, top_origin=False)
    out1 = obj_loader._load_tga_rgba(p1)
    np.testing.assert_array_equal(out1, rgba)

    p2 = str(tmp_path / "top.tga")
    _write_tga_uncompressed(p2, rgba, top_origin=True)
    np.testing.assert_array_equal(obj_loader._load_tga_rgba(p2), rgba)

    const = np.full((8, 16, 4), 77, np.uint8)
    p3 = str(tmp_path / "rle.tga")
    _write_tga_rle(p3, const)
    np.testing.assert_array_equal(obj_loader._load_tga_rgba(p3), const)


def test_alpha_cutout_render(obj_dir):
    """Rays through the transparent half of the leaf quad must pass
    through; opaque half blocks (closest-hit alpha rule)."""
    import jax.numpy as jnp

    from ilgpu_raytracing_tpu.models.scene import SceneBuilder
    from ilgpu_raytracing_tpu.ops import traverse

    b = SceneBuilder()
    obj_loader.add_obj_instance(b, os.path.join(obj_dir, "scene.obj"))
    scene = b.commit()
    assert scene.has_alpha

    # quad spans x,y in [0,1], z=0; mask transparent for u < 0.5 (left)
    o = jnp.asarray([[0.25, 0.5, 1.0], [0.75, 0.5, 1.0]], dtype=jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], dtype=jnp.float32)
    hit = traverse.trace_closest(scene, o, d)
    hits = np.asarray(hit.hit)
    assert not hits[0]  # transparent texel -> cutout
    assert hits[1]  # opaque texel -> hit

    occ = traverse.shadow_occlusion(scene, o, d, 10.0)
    occ = np.asarray(occ)
    assert not occ[0]
    assert occ[1]
