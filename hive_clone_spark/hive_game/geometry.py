"""Hex ↔ pixel projection (F5/F6, engine.cpp:38-43, ui_app.cpp:34-50)
as pure column expressions — the reference's most complex scalar chain,
including cube-rounding with largest-error-component correction."""

from __future__ import annotations

from pyspark.sql import functions as F

def _sqrt3():
    # lazy: F.lit needs an active SparkContext
    return F.sqrt(F.lit(3.0))


def axial_to_pixel(q, r, size: float = 40.0):
    """(px, py) columns: x = s(√3 q + (√3/2) r), y = s·1.5 r
    (engine.cpp:38-43)."""
    px = F.lit(size) * (_sqrt3() * q + _sqrt3() / F.lit(2.0) * r)
    py = F.lit(size) * F.lit(1.5) * r
    return px, py


def pixel_to_axial(px, py, size: float = 40.0):
    """(q, r) int columns via fractional axial + cube rounding with the
    largest-error-component fix (ui_app.cpp:34-50)."""
    qf = (_sqrt3() / F.lit(3.0) * px - py / F.lit(3.0)) / F.lit(size)
    rf = (F.lit(2.0) / F.lit(3.0) * py) / F.lit(size)
    # cube coords: x = qf, z = rf, y = -x-z
    x, z = qf, rf
    y = -x - z
    rx, ry, rz = F.round(x, 0), F.round(y, 0), F.round(z, 0)
    dx, dy, dz = F.abs(rx - x), F.abs(ry - y), F.abs(rz - z)
    # fix the component with the largest rounding error; tie-breaks match
    # the reference's else-if chain exactly (ui_app.cpp:46-48):
    #   x largest (strict) → fix rx; elif dy > dz → fix ry (no output
    #   effect); else (dy <= dz) → fix rz
    x_largest = (dx > dy) & (dx > dz)
    rx_f = F.when(x_largest, -ry - rz).otherwise(rx)
    rz_f = F.when(~x_largest & (dy <= dz), -rx - ry).otherwise(rz)
    return rx_f.cast("int"), rz_f.cast("int")
