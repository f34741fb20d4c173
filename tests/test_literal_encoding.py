"""The expr-string double literals (`_arr_lit`/`_mat_lit`, r14) must
be bit-for-bit the doubles Python holds: shortest-repr text parsed by
the JVM yields identical IEEE bits, including subnormals, extremes,
signed zero, and non-terminating binary fractions."""

from __future__ import annotations

import random
import struct

from mydatasyncer_spark.operators.similarity import _arr_lit, _mat_lit


def _bits(xs):
    return [struct.pack("<d", float(v)) for v in xs]


EDGE = [0.0, -0.0, 1e308, -1e308, 5e-324, -5e-324, 1.0, -1.0,
        0.1, -0.1, 1 / 3, 2 / 3, 1e-9, 123456789.123456789]


def test_arr_lit_bits_roundtrip(spark):
    rng = random.Random(11)
    vals = EDGE + [rng.uniform(-1e6, 1e6) for _ in range(300)] + [
        rng.uniform(-1e-12, 1e-12) for _ in range(100)
    ]
    row = spark.range(1).select(_arr_lit(vals).alias("a")).first()
    assert _bits(row["a"]) == _bits(vals)


def test_mat_lit_bits_roundtrip(spark):
    rng = random.Random(13)
    rows = [
        [rng.uniform(-1e3, 1e3) for _ in range(8)] for _ in range(16)
    ]
    rows[0] = EDGE[:8]
    got = spark.range(1).select(_mat_lit(rows).alias("m")).first()["m"]
    assert [_bits(r) for r in got] == [_bits(r) for r in rows]
