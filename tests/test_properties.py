"""Property-based tests (hypothesis) for the pure-Python subsystems:
inference escalation monotonicity, traffic DSL robustness, JSON repair
crash-freedom, shingle construction, resource naming."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as hst

from pipegen_spark.generator.traffic import (
    TrafficPatternError,
    parse_traffic_pattern,
)
from pipegen_spark.llm.repair import extract_json_from_markdown, repair_json
from pipegen_spark.schema.inference import ColumnProfile, _escalate

TYPE_ORDER = ["int", "long", "double", "boolean", "date", "timestamp", "string"]

cell = hst.one_of(
    hst.integers(-(2**40), 2**40).map(str),
    hst.floats(allow_nan=False, allow_infinity=False).map(repr),
    hst.sampled_from(["true", "False", "yes", "NO", "0", "1"]),
    hst.sampled_from(["2024-12-31", "2025-01-01 12:30:00", "31/12/2024"]),
    hst.text(string.ascii_letters + " .-", min_size=1, max_size=12),
)


@given(hst.lists(cell, min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_escalation_string_absorbs_and_never_narrows_to_int(values):
    """`string` is absorbing, and a column never returns to int/long once
    it left. (Full idempotence does NOT hold by design — the reference's
    boolean state escalates to double on a later numeric value,
    csv_analyzer.go boolean branch — so we assert exactly the guarantees
    the reference gives.)"""
    c = ColumnProfile(name="x")
    seen_string = False
    left_int = False
    for v in values:
        _escalate(c, v.strip() or "x")
        assert c.type in TYPE_ORDER
        if seen_string:
            assert c.type == "string"
        seen_string = c.type == "string"
        if left_int:
            assert c.type not in ("int",)
        left_int = c.type != "int"


@given(hst.lists(hst.integers(-(2**31), 2**31 - 1), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_int32_values_stay_int(values):
    c = ColumnProfile(name="x")
    for v in values:
        _escalate(c, str(v))
    assert c.type == "int"


@given(hst.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_traffic_parser_never_crashes_unexpectedly(s):
    """Any input either parses or raises TrafficPatternError — nothing
    else escapes."""
    try:
        tp = parse_traffic_pattern(s, 100)
        assert tp.get_rate_at(0.0) >= 0
    except TrafficPatternError:
        pass


@given(
    hst.integers(0, 500),
    hst.integers(1, 500),
    hst.integers(1, 1000),
)
@settings(max_examples=100, deadline=None)
def test_traffic_rate_inside_and_outside(start, length, pct):
    tp = parse_traffic_pattern(f"{start}s-{start + length}s:{pct}%", 100)
    # the engine truncates base*multiplier like the reference's int() cast;
    # compare against that exact formula (100*4.39 is 438.999… → 438)
    expected = int(100 * (pct / 100.0))
    assert tp.get_rate_at(start + length / 2) == expected
    assert tp.get_rate_at(start + length + 0.001) == 100
    assert tp.max_rate() == max(100, expected)


@given(hst.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_repair_json_never_crashes(s):
    """Arbitrary garbage either parses (after repair) or raises ValueError."""
    try:
        repair_json(s)
    except ValueError:
        pass


@given(hst.dictionaries(hst.text(string.ascii_letters, min_size=1, max_size=8),
                        hst.integers() | hst.text(max_size=20), max_size=5))
@settings(max_examples=100, deadline=None)
def test_repair_json_roundtrips_valid_json(d):
    import json

    assert repair_json(json.dumps(d)) == d
    # and survives being wrapped in a markdown fence
    assert repair_json("```json\n" + json.dumps(d) + "\n```") == d


@given(hst.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_extract_json_total(s):
    extract_json_from_markdown(s)  # never raises


# --- dialect fragments under DuckDB (no Spark needed) ------------------------

import duckdb as _duckdb

from pipegen_spark.functions import dialect as _dl

_dcon = _duckdb.connect()


@given(
    hst.integers(0, 2**40),
    hst.integers(0, 2**40),
)
@settings(max_examples=150, deadline=None)
def test_zorder16_matches_python_morton_and_masks_high_bits(x, y):
    expr = _dl.zorder16(str(x), str(y), _dl.DUCK)
    got = _dcon.execute(f"SELECT {expr}").fetchone()[0]

    def morton(a, b):
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == morton(x & 255, y & 255)
    assert 0 <= got < 2**16


def test_zorder16_is_bijective_on_the_8bit_grid():
    expr = _dl.zorder16("x", "y", _dl.DUCK)
    n = _dcon.execute(
        f"""SELECT COUNT(DISTINCT {expr})
        FROM (SELECT a.range AS x, b.range AS y
              FROM range(0,256) a CROSS JOIN range(0,256) b)"""
    ).fetchone()[0]
    assert n == 256 * 256


@given(
    hst.lists(
        hst.text(alphabet="abcde", min_size=1, max_size=4),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=40, deadline=None)
def test_cms_oracle_never_undercounts(tokens):
    """The CMS overestimate guarantee, checked through the ORACLE SQL on
    arbitrary small corpora (the Spark side is hash-matched to this SQL
    by the correctness gate)."""
    from pipegen_spark.queries.training_oracle import _cms_sql

    con = _duckdb.connect()
    text = " ".join(tokens).replace("'", "")
    con.execute(
        f"CREATE VIEW documents AS SELECT 1 AS doc_id, '{text}' AS text"
    )
    rows = con.execute(_cms_sql()).fetchall()
    from collections import Counter

    truth = Counter(tokens)
    got = {r[0]: (r[1], r[2], r[3]) for r in rows}
    for tok, (true_count, est, over) in got.items():
        assert true_count == truth[tok]
        assert est >= true_count
        assert over == est - true_count


# --- PNG codec properties ----------------------------------------------------

_png_dims = hst.tuples(
    hst.integers(1, 12), hst.integers(1, 10), hst.sampled_from([1, 3, 4])
)


@given(
    _png_dims,
    hst.integers(0, 2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_encode_decode_roundtrip_any_pixels(dims, seed):
    """Any 8-bit pixel buffer survives encode→decode bit-exactly, for
    every channel count."""
    import random

    from pipegen_spark.operators.codecs import png_decode, png_encode

    w, h, ch = dims
    rng = random.Random(seed)
    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    assert png_decode(png_encode(w, h, px, ch)) == (w, h, ch, px)


@given(hst.binary(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_png_decode_total_on_garbage(data):
    """Arbitrary bytes either decode or raise ValueError — never
    struct.error / TypeError / IndexError (the round-5 advice class)."""
    from pipegen_spark.operators.codecs import (
        PNG_SIGNATURE,
        png_decode,
    )

    try:
        png_decode(PNG_SIGNATURE + data)
    except ValueError:
        pass
    except Exception as e:  # zlib garbage is a declared ValueError too?
        # zlib.error escapes only through a VALID chunk framing with a
        # CRC-correct IDAT, which random bytes cannot produce (CRC32
        # guards every chunk) — anything else is a real bug.
        raise AssertionError(f"non-ValueError leak: {type(e).__name__}: {e}")


@settings(max_examples=60, deadline=None)
@given(
    w=hst.integers(min_value=1, max_value=12),
    h=hst.integers(min_value=1, max_value=12),
    ch=hst.sampled_from([1, 3]),
    data=hst.data(),
)
def test_jpeg_roundtrip_error_bounded(w, h, ch, data):
    """Property: baseline JPEG at quant=1 reconstructs ANY small image
    within the DCT/color-rounding bound — arbitrary dims (padding+crop),
    gray and RGB, arbitrary pixel bytes."""
    from pipegen_spark.operators.codecs import jpeg_decode, jpeg_encode

    n = w * h * ch
    px = bytes(
        data.draw(
            hst.lists(
                hst.integers(0, 255), min_size=n, max_size=n
            )
        )
    )
    ww, hh, cc, out = jpeg_decode(jpeg_encode(w, h, px, ch))
    assert (ww, hh, cc) == (w, h, ch)
    assert len(out) == n
    tol = 6 if ch == 3 else 2  # gray skips the YCbCr round-trip
    assert max(abs(a - b) for a, b in zip(px, out)) <= tol


# --- BPE wrapped-string merge encoding ---------------------------------------
#
# text.bpe_train represents a word as ' a  b  c ' (each symbol wrapped
# in single spaces) and applies a merge of (x, y) as
# replace(w, ' x  y ', ' xy ') — claiming SQL/str replace's
# left-to-right non-overlapping scan IS the BPE merge rule and that
# the doubled separator makes cross-boundary matches impossible.
# Python str.replace has the same scan semantics as Spark/DuckDB
# replace, so the claim is checkable exhaustively without a session.


def _list_merge(syms, x, y):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _wrap(syms):
    return "".join(f" {s} " for s in syms)


@given(
    hst.lists(
        hst.text(alphabet="ab1", min_size=1, max_size=3),
        min_size=0,
        max_size=8,
    ),
    hst.text(alphabet="ab1", min_size=1, max_size=3),
    hst.text(alphabet="ab1", min_size=1, max_size=3),
)
@settings(max_examples=300, deadline=None)
def test_bpe_wrapped_replace_equals_list_merge(syms, x, y):
    got = _wrap(syms).replace(f" {x}  {y} ", f" {x}{y} ")
    assert got == _wrap(_list_merge(syms, x, y))


def test_bpe_wrapped_replace_overlap_pins():
    # aaa + (a,a): counting sees the pair twice, the merge collapses
    # left-to-right once -> [aa, a]; then (aa, a) finishes the word.
    w = _wrap(list("aaa"))
    w = w.replace(" a  a ", " aa ")
    assert w == _wrap(["aa", "a"])
    assert w.replace(" aa  a ", " aaa ") == _wrap(["aaa"])


@given(hst.integers(min_value=1, max_value=(1 << 63) - 1))
@settings(max_examples=300)
def test_log2_fp_tracks_math_log2(x):
    """The fixed-point log2 stays within 4 output units (6e-5 bits) of
    math.log2 across the whole BIGINT domain (r10: the mantissa
    pre-reduction extends it past 2^33) and never exceeds the exact
    value (truncations only lose)."""
    import math

    from pipegen_spark.operators.text import LOG2_FRAC_BITS, log2_fp_py

    scale = 1 << LOG2_FRAC_BITS
    fp = log2_fp_py(x)
    exact = math.log2(x)
    assert fp <= exact * scale + 1e-6
    assert abs(fp / scale - exact) < 4 / scale


@given(
    hst.integers(min_value=(1 << 32) - (1 << 12), max_value=(1 << 34)),
    hst.integers(min_value=1, max_value=1 << 10),
)
@settings(max_examples=200)
def test_log2_fp_monotone_across_reduction_boundary(x, step):
    """Monotonicity must survive the e=32 -> e=33 hand-off where the
    mantissa pre-reduction first engages (a truncated mantissa on the
    wide side must never dip below the exact narrow-side value)."""
    from pipegen_spark.operators.text import log2_fp_py

    assert log2_fp_py(x + step) >= log2_fp_py(x)


@given(
    hst.integers(min_value=1, max_value=(1 << 20) - 2),
    hst.integers(min_value=1, max_value=1 << 10),
)
@settings(max_examples=200)
def test_log2_fp_monotone(x, step):
    """Non-strict monotonicity: a larger input never yields a smaller
    fixed-point log2 (the filter-threshold property callers rely on)."""
    from pipegen_spark.operators.text import log2_fp_py

    assert log2_fp_py(x + step) >= log2_fp_py(x)
