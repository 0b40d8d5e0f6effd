"""Viewport math of the demo's zoom/pan canvas (headless — no display)."""

import numpy as np

from isegprobe_tpu.interactive_demo.canvas import Viewport


def test_fit_centers_and_fits():
    vp = Viewport.fit(img_w=400, img_h=200, canvas_w=200, canvas_h=200)
    assert vp.scale == 0.5  # limited by width
    # vertical centering: image y=100 (middle) maps to canvas y=100
    assert np.isclose(vp.to_canvas(200, 100)[1], 100.0)


def test_click_mapping_roundtrip_and_bounds():
    vp = Viewport.fit(100, 80, 200, 200).zoom_at(50, 50, 3.0).pan(17, -9)
    ix, iy = vp.to_image(123.0, 77.0)
    cx, cy = vp.to_canvas(ix, iy)
    assert np.isclose(cx, 123.0) and np.isclose(cy, 77.0)
    # clicks outside the image are rejected
    far = vp.to_canvas(1000, 1000)
    assert vp.image_click(*far) is None


def test_zoom_anchors_cursor_point():
    vp = Viewport.fit(640, 480, 320, 240)
    anchor_img = vp.to_image(100, 120)
    vp2 = vp.zoom_at(100, 120, 2.5)
    assert np.allclose(vp2.to_image(100, 120), anchor_img)
    assert np.isclose(vp2.scale, vp.scale * 2.5)


def test_zoom_clamped():
    vp = Viewport.fit(64, 64, 64, 64)
    for _ in range(40):
        vp = vp.zoom_at(32, 32, 3.0)
    assert vp.scale <= 32.0
    for _ in range(80):
        vp = vp.zoom_at(32, 32, 1 / 3.0)
    assert vp.scale >= 0.05


def test_pan_moves_view_in_drag_direction():
    vp = Viewport.fit(100, 100, 100, 100)
    # dragging content right by 10 canvas px shows image 10/scale px to the left
    vp2 = vp.pan(10, 0)
    assert np.isclose(vp2.ox, vp.ox - 10 / vp.scale)


def test_render_visible_crop():
    rng = np.random.default_rng(0)
    img = (rng.random((80, 120, 3)) * 255).astype(np.uint8)
    vp = Viewport.fit(120, 80, 60, 40)  # scale 0.5
    view, cx, cy = vp.render(img)
    assert view.shape[:2] == (40, 60) and (cx, cy) == (0, 0)
    # zoomed-in: 2x on the top-left quadrant
    vp2 = Viewport(120, 80, 60, 40, scale=2.0, ox=10, oy=5)
    view2, _, _ = vp2.render(img)
    assert view2.shape[:2] == (40, 60)
    # nearest-neighbour at high zoom keeps exact pixel values
    vp3 = Viewport(120, 80, 60, 40, scale=10.0, ox=10, oy=5)
    view3, _, _ = vp3.render(img)
    assert (view3[0, 0] == img[5, 10]).all()
