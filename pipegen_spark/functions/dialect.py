"""Dual-dialect SQL expression builders (Spark SQL + DuckDB).

Every builder returns a SQL fragment string for the requested dialect. The
Spark side is consumed via `F.expr(...)` inside DataFrame plans (JVM-side,
whole-stage codegen — no Python UDFs); the DuckDB side is assembled into the
oracle queries. Keeping one template per primitive guarantees the engine and
its oracle compute the *same* function, including:

- 60-bit deterministic hash from md5 (portable across engines, unlike
  murmur3 `hash()`),
- left-fold accumulation for anything summing doubles inside a row, so IEEE
  addition order is fixed and results are bit-identical,
- set-style array ops with explicit distinct semantics.

All integer hash math is done mod M31 = 2^31-1 so products with small
multipliers stay far below int64 overflow (ANSI mode would error on it).
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duckdb"

# Mersenne prime 2^31-1: hash values stay < 2^31, products with 32-bit
# coefficients fit comfortably in int64.
M31 = 2_147_483_647


def _check(d: str) -> None:
    if d not in (SPARK, DUCK):
        raise ValueError(f"unknown dialect {d!r}")


def hash60(s: str, d: str) -> str:
    """Deterministic 60-bit non-negative hash of a string expression."""
    _check(d)
    if d == SPARK:
        return f"CAST(conv(substr(md5({s}),1,15),16,10) AS BIGINT)"
    return f"CAST(('0x'||substr(md5({s}),1,15)) AS BIGINT)"


def hash_m31(s: str, d: str) -> str:
    """hash60 reduced mod 2^31-1 (safe for linear-permutation minhash)."""
    return f"(({hash60(s, d)}) % {M31})"


def words(s: str, d: str) -> str:
    """Lower-cased alphanumeric tokens of a text expression (no empties)."""
    _check(d)
    if d == SPARK:
        return f"filter(split(lower({s}),'[^a-z0-9]+'), x -> x <> '')"
    return (
        f"list_filter(regexp_split_to_array(lower({s}),'[^a-z0-9]+'),"
        " x -> x <> '')"
    )


def transform(arr: str, lam: str, d: str) -> str:
    _check(d)
    return f"transform({arr}, {lam})" if d == SPARK else f"list_transform({arr}, {lam})"


def filter_(arr: str, lam: str, d: str) -> str:
    _check(d)
    return f"filter({arr}, {lam})" if d == SPARK else f"list_filter({arr}, {lam})"


def arr_sort(arr: str, d: str) -> str:
    """Ascending array sort (no-null inputs): the determinism primitive for
    cross-row double sums — collect, sort, left-fold, so the accumulation
    order is pinned regardless of partial-aggregation order."""
    _check(d)
    return f"sort_array({arr})" if d == SPARK else f"list_sort({arr})"


def fold(arr: str, init: str, lam: str, d: str) -> str:
    """Sequential left fold: Spark `aggregate`, DuckDB `list_reduce` with the
    init prepended (DuckDB's reduce seeds from the first element)."""
    _check(d)
    if d == SPARK:
        return f"aggregate({arr}, {init}, {lam})"
    return f"list_reduce(list_prepend({init}, {arr}), {lam})"


def elem(arr: str, i: str, d: str) -> str:
    """1-based element access."""
    _check(d)
    return f"element_at({arr},{i})" if d == SPARK else f"list_extract({arr},{i})"


def size(arr: str, d: str) -> str:
    _check(d)
    return f"size({arr})" if d == SPARK else f"len({arr})"


def arr_distinct(arr: str, d: str) -> str:
    _check(d)
    return f"array_distinct({arr})" if d == SPARK else f"list_distinct({arr})"


def arr_min(arr: str, d: str) -> str:
    _check(d)
    return f"array_min({arr})" if d == SPARK else f"list_min({arr})"


def arr_max(arr: str, d: str) -> str:
    _check(d)
    return f"array_max({arr})" if d == SPARK else f"list_max({arr})"


def intersect_size(a: str, b: str, d: str) -> str:
    """|A ∩ B| for distinct arrays."""
    _check(d)
    if d == SPARK:
        return f"size(array_intersect({a},{b}))"
    return f"len(list_intersect({a},{b}))"


def union_size(a: str, b: str, d: str) -> str:
    """|A ∪ B| for distinct arrays."""
    _check(d)
    if d == SPARK:
        return f"size(array_union({a},{b}))"
    return f"len(list_distinct(list_concat({a},{b})))"


def contains(arr: str, x: str, d: str) -> str:
    _check(d)
    return f"array_contains({arr},{x})" if d == SPARK else f"list_contains({arr},{x})"


def slice_(arr: str, start: int | str, length: int, d: str) -> str:
    """1-based slice of `length` elements starting at `start` (an int or a
    SQL expression, e.g. a lambda variable)."""
    _check(d)
    if d == SPARK:
        return f"slice({arr},{start},{length})"
    if isinstance(start, int):
        return f"({arr})[{start}:{start + length - 1}]"
    return f"({arr})[({start}):({start})+{length - 1}]"


def arr_join(arr: str, sep: str, d: str) -> str:
    """Join array elements to a string; empty array -> '' on BOTH engines
    (Spark's array_join already does; DuckDB's array_to_string returns
    NULL for an empty list, so it is wrapped)."""
    _check(d)
    if d == SPARK:
        return f"array_join({arr},'{sep}')"
    return f"COALESCE(array_to_string({arr},'{sep}'), '')"


def seq(lo: str, hi: str, d: str) -> str:
    """Inclusive integer sequence [lo, hi] as an array."""
    _check(d)
    return f"sequence({lo},{hi})" if d == SPARK else f"range({lo},({hi})+1)"


def lines(s: str, d: str) -> str:
    """Split a text expression on newlines (chr(10) on both engines: a
    quoted '\\n' literal is an escape in Spark SQL but two characters in
    DuckDB, so the split char is built with chr() instead of a literal)."""
    _check(d)
    if d == SPARK:
        return f"split({s}, chr(10))"
    return f"string_split({s}, chr(10))"


def rlike(s: str, pat: str, d: str) -> str:
    """Boolean regexp match (Java regex vs RE2 — keep patterns in the
    shared subset: char classes, anchors, bounded repetition)."""
    _check(d)
    if d == SPARK:
        return f"({s} rlike '{pat}')"
    return f"regexp_matches({s}, '{pat}')"


def regexp_count(s: str, pat: str, d: str) -> str:
    """Number of non-overlapping matches of `pat` in `s`."""
    _check(d)
    if d == SPARK:
        return f"regexp_count({s}, '{pat}')"
    return f"len(regexp_extract_all({s}, '{pat}'))"


def regexp_replace_all(s: str, pat: str, rep: str, d: str) -> str:
    """Global regexp replace (DuckDB defaults to first-match-only)."""
    _check(d)
    if d == SPARK:
        return f"regexp_replace({s},'{pat}','{rep}')"
    return f"regexp_replace({s},'{pat}','{rep}','g')"


def money(x: str, d: str) -> str:
    """Portable DOUBLE -> DECIMAL(18,2) with half-up cent rounding.

    A raw double->DECIMAL(18,2) cast is engine-sensitive at `.xx5` edges:
    Spark HALF_UPs the shortest decimal repr while DuckDB rounds the binary
    value, so the same double can land one cent apart (the round-1
    q38_range_agg hash mismatch). Quantizing first — floor(x*100 + 0.5)/100
    — happens entirely in IEEE double arithmetic, bit-identical everywhere;
    the decimal cast then sees a double within ~1 ulp of an exact n/100,
    which every engine rounds to the same n cents (the nearest halfway
    point is 0.005 away — 13 orders of magnitude beyond double error)."""
    _check(d)
    return f"CAST(floor(({x}) * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))"


def cents(x: str, d: str) -> str:
    """Portable DOUBLE -> BIGINT half-up cent count.

    Same quantization as money() but the surface type is a 64-bit integer:
    the value that leaves the engine is a count of cents, which cannot
    diverge on decimal formatting, ulp rounding, or an engine's DECIMAL
    canonicalization — the gate-hardened output type for money aggregates
    (the q38/q43 driver hash mismatches of rounds 2-3 survived even the
    money() DECIMAL discipline, so those queries now emit integers)."""
    _check(d)
    return f"CAST(floor(({x}) * 100.0 + 0.5) AS BIGINT)"


def micro_avg(sum_cents: str, cnt: str, d: str) -> str:
    """Half-up mean in MILLIONTHS of a unit from a BIGINT cent sum and a
    BIGINT count: cents/count * 10^4 = units * 10^6.

    Both factors convert to DOUBLE exactly (cent sums < 2^53 up to ~90
    trillion units) and the *10000.0, /, +0.5, floor sequence is the same
    deterministic IEEE evaluation on both engines, so the BIGINT result is
    identical — an integer average surface with 6 decimal digits kept."""
    _check(d)
    return (
        f"CAST(floor(CAST({sum_cents} AS DOUBLE) * 10000.0 / "
        f"CAST({cnt} AS DOUBLE) + 0.5) AS BIGINT)"
    )


def shr(x: str, n: str, d: str) -> str:
    _check(d)
    return f"shiftright({x},{n})" if d == SPARK else f"(({x}) >> ({n}))"


def shl(x: str, n: int, d: str) -> str:
    _check(d)
    return f"shiftleft({x},{n})" if d == SPARK else f"(({x}) << {n})"


def idiv(a: str, b: str, d: str) -> str:
    """Integer (floor-toward-zero) division of BIGINTs — exact and
    engine-identical, the log-free way to emit a rational score with a
    pinned scale (numerator pre-multiplied by the scale)."""
    _check(d)
    return f"(({a}) DIV ({b}))" if d == SPARK else f"(({a}) // ({b}))"


def mul_ppm(x: str, ppm: int, d: str) -> str:
    """floor(x * ppm / 1e6) for non-negative BIGINT x WITHOUT the
    intermediate x*ppm product: with x = q*1e6 + r the identity
    q*ppm + floor(r*ppm/1e6) is exact, and neither term can overflow
    until x itself nears BIGINT max (r < 1e6 and ppm < ~1e6 bound the
    second term by ~1e12; the first is x/1e6 * ppm ≈ the result).
    The naive form overflows at x ≈ 9.2e18/ppm ≈ 9.7e12 tokens —
    i.e. well inside a 100 TB corpus."""
    _check(d)
    div = "DIV" if d == SPARK else "//"
    return (
        f"(((({x}) {div} 1000000) * {ppm})"
        f" + (((({x}) % 1000000) * {ppm}) {div} 1000000))"
    )


def bigram_idx(words_expr: str, d: str) -> str:
    """Index array [1 .. size-1] over a token array — the left positions
    of its adjacent bigrams. Safe on 0/1-token docs (empty result):
    a bare sequence(1, size-1) would DESCEND on Spark when size < 2."""
    _check(d)
    n = size(words_expr, d)
    guarded = seq("1", f"greatest(({n}) - 1, 1)", d)
    return filter_(guarded, f"i -> i <= ({n}) - 1", d)


# --- composite builders ------------------------------------------------------


def word_shingles(words_expr: str, k: int, d: str) -> str:
    """Distinct k-word shingles (space-joined) from a token-array expression.

    k=1 returns the distinct token set. Documents shorter than k yield an
    empty array.
    """
    if k == 1:
        return arr_distinct(words_expr, d)
    w = words_expr
    parts = [elem("__w", f"(i+{j})" if j else "i", d) for j in range(k)]
    if d == SPARK:
        body = "concat(" + ", ' ', ".join(parts) + ")"
    else:
        body = " || ' ' || ".join(parts)
    idx = seq("1", f"{size('__w', d)}-{k - 1}", d)
    shingled = transform(idx, f"i -> {body}", d).replace("__w", w)
    guarded = (
        f"CASE WHEN {size(w, d)} >= {k} THEN {arr_distinct(shingled, d)} "
        f"ELSE {arr_distinct(slice_(w, 1, 0, d), d)} END"
    )
    return guarded


def word_shingles_all(words_expr: str, k: int, d: str) -> str:
    """ALL k-word shingles (space-joined) WITH multiplicity, in document
    order — the multiset variant of `word_shingles` for totals/ratios
    (diversity, repetition). k=1 returns the token array itself.
    Documents shorter than k yield an empty array."""
    if k == 1:
        return words_expr
    w = words_expr
    parts = [elem("__w", f"(i+{j})" if j else "i", d) for j in range(k)]
    if d == SPARK:
        body = "concat(" + ", ' ', ".join(parts) + ")"
    else:
        body = " || ' ' || ".join(parts)
    idx = seq("1", f"{size('__w', d)}-{k - 1}", d)
    shingled = transform(idx, f"i -> {body}", d).replace("__w", w)
    return (
        f"CASE WHEN {size(w, d)} >= {k} THEN {shingled} "
        f"ELSE {slice_(w, 1, 0, d)} END"
    )


def dot_double(a: str, b: str, dim_expr, d: str) -> str:
    """Dot product of two float arrays in DOUBLE with a FIXED left-to-right
    association order — bit-identical across engines.

    With an integer `dim_expr`, renders an explicit multiply-add chain:
    plain expressions stay inside whole-stage codegen, whereas Catalyst's
    higher-order `aggregate` lambda is interpreted (~10x slower on hot
    pair-scoring paths). A left-assoc chain `x1+x2+...` equals the fold
    `((0+x1)+x2)+...` for every input (IEEE 0.0+x == x up to the sign of
    zero, and both sides always render the SAME shape). Falls back to the
    fold form when the dimension is only known as an expression.
    """
    if isinstance(dim_expr, int):
        terms = [
            f"(CAST({elem(a, str(i), d)} AS DOUBLE) * CAST({elem(b, str(i), d)} AS DOUBLE))"
            for i in range(1, dim_expr + 1)
        ]
        return "(" + " + ".join(terms) + ")"
    prods = transform(
        seq("1", dim_expr, d),
        f"i -> CAST({elem(a, 'i', d)} AS DOUBLE) * CAST({elem(b, 'i', d)} AS DOUBLE)",
        d,
    )
    return fold(prods, "CAST(0.0 AS DOUBLE)", "(acc,x) -> acc + x", d)


def norm2_double(a: str, dim_expr, d: str) -> str:
    """Squared L2 norm in DOUBLE (same association discipline)."""
    if isinstance(dim_expr, int):
        terms = [
            f"(CAST({elem(a, str(i), d)} AS DOUBLE) * CAST({elem(a, str(i), d)} AS DOUBLE))"
            for i in range(1, dim_expr + 1)
        ]
        return "(" + " + ".join(terms) + ")"
    sq = transform(
        seq("1", dim_expr, d),
        f"i -> CAST({elem(a, 'i', d)} AS DOUBLE) * CAST({elem(a, 'i', d)} AS DOUBLE)",
        d,
    )
    return fold(sq, "CAST(0.0 AS DOUBLE)", "(acc,x) -> acc + x", d)


def arr_sub(a: str, b: str, dim_expr, d: str) -> str:
    """Element-wise DOUBLE difference a[i] - b[i] over 1..dim — the
    residual-vector builder (IVF-PQ). IEEE subtraction, so bit-identical
    across engines for identical inputs."""
    _check(d)
    return transform(
        seq("1", dim_expr, d),
        f"i -> CAST({elem(a, 'i', d)} AS DOUBLE)"
        f" - CAST({elem(b, 'i', d)} AS DOUBLE)",
        d,
    )


def dist2_double(a: str, b: str, dim_expr, d: str) -> str:
    """Squared L2 distance in DOUBLE (same association discipline)."""
    if isinstance(dim_expr, int):
        terms = [
            f"((CAST({elem(a, str(i), d)} AS DOUBLE) - CAST({elem(b, str(i), d)} AS DOUBLE))"
            f" * (CAST({elem(a, str(i), d)} AS DOUBLE) - CAST({elem(b, str(i), d)} AS DOUBLE)))"
            for i in range(1, dim_expr + 1)
        ]
        return "(" + " + ".join(terms) + ")"
    diffs = transform(
        seq("1", dim_expr, d),
        f"i -> (CAST({elem(a, 'i', d)} AS DOUBLE) - CAST({elem(b, 'i', d)} AS DOUBLE))"
        f" * (CAST({elem(a, 'i', d)} AS DOUBLE) - CAST({elem(b, 'i', d)} AS DOUBLE))",
        d,
    )
    return fold(diffs, "CAST(0.0 AS DOUBLE)", "(acc,x) -> acc + x", d)


def cosine_double(a: str, b: str, dim_expr, d: str) -> str:
    return (
        f"({dot_double(a, b, dim_expr, d)}) / "
        f"(sqrt({norm2_double(a, dim_expr, d)}) * sqrt({norm2_double(b, dim_expr, d)}))"
    )


def minhash_sig_entry(shingles_expr: str, a: int, b: int, d: str) -> str:
    """One minhash signature entry: min over shingles of (a*h + b) mod M31.

    Empty shingle set → M31 (sentinel larger than any hash)."""
    hashed = transform(
        shingles_expr, f"s -> (({a} * ({hash_m31('s', d)}) + {b}) % {M31})", d
    )
    return (
        f"CASE WHEN {size(shingles_expr, d)} > 0 THEN {arr_min(hashed, d)} "
        f"ELSE {M31} END"
    )


def rolling_fingerprint(words_expr: str, d: str) -> str:
    """Order-sensitive document fingerprint: left fold
    acc = (acc*31 + hash_m31(word)) mod M31."""
    hashed = transform(words_expr, f"w -> {hash_m31('w', d)}", d)
    return fold(
        hashed,
        "CAST(0 AS BIGINT)",
        f"(acc,x) -> (acc * 31 + x) % {M31}",
        d,
    )


def zorder16(x: str, y: str, d: str) -> str:
    """16-bit Morton (z-order) key interleaving the low 8 bits of two
    integer expressions: bit i of x lands at position 2i, bit i of y at
    2i+1. Pure integer shifts/masks — identical on both engines.

    Z-ordering is the multi-dimensional layout trick: rows sorted by the
    interleaved key cluster in BOTH dimensions at once, so min/max
    column statistics (parquet row groups, Delta/Iceberg file skipping)
    prune range predicates on either x or y — where a single-column sort
    only prunes one.
    """
    _check(d)
    terms = []
    for i in range(8):
        terms.append(f"({shl(f'({shr(x, str(i), d)}) & 1', 2 * i, d)})")
        terms.append(f"({shl(f'({shr(y, str(i), d)}) & 1', 2 * i + 1, d)})")
    return "(" + " + ".join(terms) + ")"


def log2_bucket(x: str, max_bits: int, d: str) -> str:
    """Integer log2 bucket of a non-negative integer expression:
    bit_length(x) clamped to max_bits — 0 for x<=0, 1 for x=1, 2 for
    2..3, 3 for 4..7, ... Generated as a pure-integer CASE ladder (no
    floating log, whose last-ulp behavior is libm-dependent), identical
    text both dialects."""
    _check(d)
    whens = " ".join(
        f"WHEN ({x}) < {1 << b} THEN {b}" for b in range(max_bits)
    )
    return f"(CASE {whens} ELSE {max_bits} END)"


def regexp_replace_backref(s: str, pat: str, group_ref: int, d: str) -> str:
    """Global regexp replace where the replacement is a single captured
    group — the one replacement form whose syntax diverges: Java (Spark)
    spells it `$1`, RE2 (DuckDB) spells it `\\1`."""
    _check(d)
    if d == SPARK:
        return f"regexp_replace({s},'{pat}','${group_ref}')"
    return f"regexp_replace({s},'{pat}','\\{group_ref}','g')"


def url_canon(u: str, d: str) -> str:
    """Canonical form of a URL expression (round-12, the dedup rule a
    crawl pipeline applies before exact URL dedup — the documented
    normalization set, cf. RFC 3986 §6 syntax-based normalization plus
    the standard tracking-param strip):

    1. drop the fragment;
    2. lowercase the scheme://authority prefix (path/query stay
       case-sensitive per the RFC);
    3. strip a leading `www.` host label;
    4. strip the scheme-default port (:80 http, :443 https);
    5. drop `utm_*` tracking parameters (single-pass: one utm param per
       URL is normalized; adjacent chained utm params are a documented
       boundary — the gated construction emits at most one);
    6. strip one trailing slash of the path (never the root).

    Pure regexp_replace chain, identical pattern TEXT on both engines
    (conservative syntax valid in both Java regex and RE2); only the
    backreference spelling differs (see regexp_replace_backref).
    """
    _check(d)
    # 1. fragment
    u1 = regexp_replace_all(u, "#.*$", "", d)
    # scheme://authority prefix vs the rest
    prefix = f"regexp_extract({u1}, '^[^/]*//[^/?]*', 0)"
    tail = f"substr({u1}, length({prefix}) + 1)"
    # 2-4. lowercase prefix, strip www. and default ports
    p1 = f"lower({prefix})"
    p2 = regexp_replace_all(p1, "://www\\.", "://", d)
    p3 = regexp_replace_all(p2, ":80$", "", d)
    p4 = regexp_replace_all(p3, ":443$", "", d)
    # 5. utm params: mid-list (keep the separator) then list-final
    t1 = regexp_replace_backref(tail, "([?&])utm_[^&]*&", 1, d)
    t2 = regexp_replace_all(t1, "[?&]utm_[^&]*$", "", d)
    # 6. one trailing path slash (before the query or at the end)
    t3 = regexp_replace_backref(t2, "/([?]|$)", 1, d)
    return f"({p4} || {t3})"


def str_cast(x: str, d: str) -> str:
    """Portable integer->string cast (STRING vs VARCHAR spelling)."""
    _check(d)
    return f"CAST({x} AS {'STRING' if d == SPARK else 'VARCHAR'})"


def luhn16(card: str, d: str) -> str:
    """Luhn checksum validity (1/0) of a 16-digit string expression —
    the credit-card checkfilter a PII scrubber runs on candidate digit
    runs (ISO/IEC 7812). Unrolled pure-integer CASE sum (no lambdas,
    no engine-specific list functions): from the right, every second
    digit doubles with 9-subtraction; valid iff the total is % 10 = 0.
    With fixed length 16, the doubled digits are the odd 1-based
    positions from the left."""
    _check(d)
    terms = []
    for i in range(1, 17):
        dd = f"CAST(substr({card},{i},1) AS INT)"
        if i % 2 == 1:
            terms.append(
                f"(CASE WHEN {dd}*2 > 9 THEN {dd}*2-9 ELSE {dd}*2 END)"
            )
        else:
            terms.append(f"({dd})")
    total = " + ".join(terms)
    return f"(CASE WHEN ({total}) % 10 = 0 THEN 1 ELSE 0 END)"
