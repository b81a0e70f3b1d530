"""Property test: the closed-form ROT normal equations equal numpy lstsq on
arbitrary site sets — the identity that lets the engine replace the
reference's per-glass L-BFGS-B with one aggregate."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from python_async_sample_spark.kernels.rot import _fit_group_np

finite = st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False)


@st.composite
def sites(draw):
    n = draw(st.integers(min_value=3, max_value=24))
    col = lambda: draw(
        st.lists(finite, min_size=n, max_size=n).map(lambda v: np.array(v))
    )
    return col(), col(), col(), col()


def closed_form(x, y, dx, dy):
    vd = dx.var() + dy.var()
    t = ((x * dy).mean() - x.mean() * dy.mean() - ((y * dx).mean() - y.mean() * dx.mean())) / vd if vd > 0 else 0.0
    return t * dy.mean() - x.mean(), -y.mean() - t * dx.mean(), t


@settings(max_examples=50, deadline=None)
@given(sites())
def test_closed_form_equals_lstsq(s):
    x, y, dx, dy = s
    sx_c, sy_c, t_c = closed_form(x, y, dx, dy)
    sx_l, sy_l, t_l = _fit_group_np(x, y, dx, dy)
    if dx.var() + dy.var() < 1e-9:
        return  # degenerate design: rotation unidentifiable, lstsq picks min-norm
    scale = 1.0 + abs(t_c) + abs(sx_c) + abs(sy_c)
    assert abs(t_c - t_l) < 1e-6 * scale
    assert abs(sx_c - sx_l) < 1e-6 * scale
    assert abs(sy_c - sy_l) < 1e-6 * scale
