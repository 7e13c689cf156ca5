"""Headless drive of the designer GUI event handlers (Agg backend): presses,
drags, splits, toggles, and slider changes must mutate the design and
re-render without a display server."""

import os
import sys
import types

import numpy as np
import pytest

pytest.importorskip("matplotlib")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture(scope="module")
def app(tmp_path_factory):
    os.environ["VFG_MPL_BACKEND"] = "Agg"
    from gen_input import make_input_yuv
    from versatilefilmgrain_tpu.designer.app import DesignerApp

    path = str(tmp_path_factory.mktemp("yuv") / "in.yuv")
    make_input_yuv(path, 256, 192, 10, 0, 2)
    return DesignerApp(path, 256, 192, 10, 0)


def _ev(ax, x, y, button=1, dblclick=False, px=0.0, py=0.0, step=0):
    return types.SimpleNamespace(inaxes=ax, xdata=x, ydata=y, button=button,
                                 dblclick=dblclick, key=None, x=px, y=py,
                                 step=step)


def test_initial_render(app):
    assert app.grained[0].shape == (192, 256)
    assert not np.array_equal(app.grained[0], app.planes[0])


def test_drag_scale(app):
    before = app.design.values[0][0][0]
    app._on_press(_ev(app.ax_edit, 20, 200))      # inside interval 0
    assert app._drag is not None and app._drag[0] == "scale"
    app._on_motion(_ev(app.ax_edit, 20, 222))
    app._on_release(_ev(app.ax_edit, 20, 222))
    assert app.design.values[0][0][0] == 222 != before


def test_double_click_split(app):
    n0 = app.design.num_intervals(0)
    app._on_press(_ev(app.ax_edit, 20, 100, dblclick=True))
    assert app.design.num_intervals(0) == n0 + 1


def test_right_click_toggle(app):
    app._on_press(_ev(app.ax_edit, 20, 100, button=3))
    assert app.design.enable[0][0] is False
    app._on_press(_ev(app.ax_edit, 20, 100, button=3))
    assert app.design.enable[0][0] is True


def test_key_switch_component(app):
    app._on_key(types.SimpleNamespace(key="2"))
    assert app.comp == 1
    app._on_key(types.SimpleNamespace(key="o"))
    assert app.show_original
    app._on_key(types.SimpleNamespace(key="o"))
    app._on_key(types.SimpleNamespace(key="1"))


def test_drag_upper_bound_at_255(app):
    """The last interval's upper edge (255) must be grabbable (uint8
    overflow regression: np.uint8(255)+1 wrapped to 0)."""
    c = app.comp = 0
    k = app.design.num_intervals(c) - 1
    assert app.design.upper[c][k] == 255
    app._on_press(_ev(app.ax_edit, 255.5, 50))
    assert app._drag == ("upper", c, k)
    app._on_release(_ev(app.ax_edit, 255.5, 50))


def test_slider_gain(app):
    app._on_gain(60)
    assert app.design.gain == 60
    # regrain happened with the new gain
    assert app.grained[0].shape == (192, 256)


def test_scroll_zoom_and_reset(app):
    """Scroll on the preview zooms toward the cursor at native display
    pixels (reference ladder: ... 1/3, 1/2, 1, 2, 3, 4); '0' resets to
    fit."""
    assert app.zoom is None                      # initial view fits
    x0, x1 = app.ax_img.get_xlim()
    assert abs((x1 - x0) - 256) < 1e-6
    app._on_scroll(_ev(app.ax_img, 40.0, 30.0, step=1))
    assert app.zoom == 1.0                       # fit -> native 1:1
    bw, _ = app._view_px()
    x0, x1 = app.ax_img.get_xlim()
    assert abs((x1 - x0) - bw) < 1e-6            # one image px per pane px
    app._on_scroll(_ev(app.ax_img, 40.0, 30.0, step=1))
    assert app.zoom == 2.0
    x0, x1 = app.ax_img.get_xlim()
    assert abs((x1 - x0) - bw / 2) < 1e-6
    app._on_scroll(_ev(app.ax_img, 40.0, 30.0, step=-1))
    app._on_scroll(_ev(app.ax_img, 40.0, 30.0, step=-1))
    assert app.zoom == 0.5                       # harmonic below 1
    app._on_scroll(_ev(app.ax_img, 40.0, 30.0, step=-1))
    assert abs(app.zoom - 1 / 3) < 1e-9
    app._on_key(types.SimpleNamespace(key="+"))
    app._on_key(types.SimpleNamespace(key="+"))
    assert app.zoom == 1.0
    app._on_key(types.SimpleNamespace(key="0"))
    assert app.zoom is None
    x0, x1 = app.ax_img.get_xlim()
    assert abs((x1 - x0) - 256) < 1e-6


def test_pan_clamped(app):
    """Left-drag on the preview pans; the view never leaves the image."""
    for _ in range(4):                           # zoom to 4 (view < image)
        app._on_key(types.SimpleNamespace(key="+"))
    assert app.zoom == 4.0
    assert app._view_px()[0] / 4 < 256           # window fits inside
    c0 = app.view_center
    app._on_press(_ev(app.ax_img, 10.0, 10.0, px=100.0, py=100.0))
    assert app._pan is not None
    app._on_motion(_ev(app.ax_img, None, None, px=90.0, py=100.0))
    assert app.view_center[0] > c0[0]            # dragged left -> view right
    app._on_release(_ev(app.ax_img, 0, 0))
    assert app._pan is None
    # pan far beyond the edge: clamped to the last valid window
    app._on_press(_ev(app.ax_img, 10.0, 10.0, px=0.0, py=0.0))
    app._on_motion(_ev(app.ax_img, None, None, px=-1e6, py=1e6))
    app._on_release(_ev(app.ax_img, 0, 0))
    x0, x1 = app.ax_img.get_xlim()
    assert x0 >= -0.5 - 1e-6 and x1 <= 255.5 + 1e-6
    app._on_key(types.SimpleNamespace(key="0"))


def test_fullscreen_toggle(app):
    app._on_press(_ev(app.ax_img, 5.0, 5.0, dblclick=True))
    assert app.fullscreen
    app._on_key(types.SimpleNamespace(key="f"))
    assert not app.fullscreen


def test_mode_cycle(app):
    """'m' cycles RGB -> Y -> Cb -> Cr; plane modes track plane size."""
    assert app.mode == 3 and app._imsize == (256, 192)
    app._on_key(types.SimpleNamespace(key="m"))
    assert app.mode == 0 and app._imsize == (256, 192)       # Y
    app._on_key(types.SimpleNamespace(key="m"))
    assert app.mode == 1 and app._imsize == (128, 96)        # Cb (4:2:0)
    app._on_key(types.SimpleNamespace(key="m"))
    assert app.mode == 2
    app._on_key(types.SimpleNamespace(key="m"))
    assert app.mode == 3


def test_load_key_roundtrip(app, tmp_path):
    """'w' then 'l' round-trips the design through the cfg file."""
    app.save_path = str(tmp_path / "design.cfg")
    app.design.values[0][0][0] = 77
    app._on_key(types.SimpleNamespace(key="w"))
    app.design.values[0][0][0] = 11
    app._on_key(types.SimpleNamespace(key="l"))
    assert app.design.values[0][0][0] == 77
