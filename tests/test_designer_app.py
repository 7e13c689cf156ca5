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


def _ev(ax, x, y, button=1, dblclick=False):
    return types.SimpleNamespace(inaxes=ax, xdata=x, ydata=y, button=button,
                                 dblclick=dblclick, key=None)


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
