"""Property-based spot checks (SURVEY.md section 5.4): Spark column
implementations vs pure-Python models over hypothesis-generated inputs.
One Spark job per example set (inputs batched into a single DataFrame).
"""

from __future__ import annotations

import re
import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flights_etl_pipeline_spark.functions.text import (
    ROLLING_BASE,
    ROLLING_MOD,
    rolling_hash,
)
from flights_etl_pipeline_spark.functions.scalar import duration_to_minutes

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_DURATION_MODEL = re.compile(r"^PT(?:(\d+)H)?(?:(\d+)M)?$")


def _duration_model(s: str) -> int | None:
    m = _DURATION_MODEL.match(s)
    if not m:
        return None
    return int(m.group(1) or 0) * 60 + int(m.group(2) or 0)


def _rolling_model(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * ROLLING_BASE + ord(ch)) % ROLLING_MOD
    return acc


duration_like = st.one_of(
    st.builds(
        lambda h, m: f"PT{h}H{m}M", st.integers(0, 99), st.integers(0, 500)
    ),
    st.builds(lambda h: f"PT{h}H", st.integers(0, 99)),
    st.builds(lambda m: f"PT{m}M", st.integers(0, 500)),
    st.just("PT"),
    st.text(string.printable, max_size=12),
)


@settings(**_SETTINGS)
@given(st.lists(duration_like, min_size=1, max_size=30))
def test_duration_parser_matches_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s STRING")
    got = [
        r["m"]
        for r in df.select(duration_to_minutes("s").alias("m"))
        .toLocalIterator()
    ]
    assert got == [_duration_model(v) for v in values]


ascii_text = st.text(
    st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)


@settings(**_SETTINGS)
@given(st.lists(ascii_text, min_size=1, max_size=30))
def test_rolling_hash_matches_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "t STRING")
    got = [
        r["h"] for r in df.select(rolling_hash("t").alias("h")).toLocalIterator()
    ]
    assert got == [_rolling_model(v) for v in values]


# ---------------------------------------------------------------------------
# SymSpell deletion-neighborhood canopy: losslessness for lev <= 2
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _deletion_variants_model(d: str) -> set[str]:
    """Pure-Python twin of queries_dedup._deletion_variants: all <=2
    deletion variants of the digit region."""
    n = len(d)
    out = {d}
    out.update(d[:i] + d[i + 1 :] for i in range(n))
    out.update(
        d[:i] + d[i + 1 : j] + d[j + 1 :]
        for i in range(n)
        for j in range(i + 1, n)
    )
    return out


@given(
    st.lists(
        st.text(alphabet=string.digits, min_size=9, max_size=9),
        min_size=2,
        max_size=12,
        unique=True,
    )
)
@settings(max_examples=200, deadline=None)
def test_deletion_canopy_lossless_for_lev2(names):
    """Every pair within edit distance 2 must share at least one
    deletion variant -- the exactness claim fuzzy_customer_pairs'
    candidate generator rests on (SymSpell neighborhood theorem)."""
    variants = {s: _deletion_variants_model(s) for s in names}
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            if _lev(a, b) <= 2:
                assert variants[a] & variants[b], (
                    f"canopy dropped true pair {a!r}~{b!r} "
                    f"(lev={_lev(a, b)})"
                )


# ---------------------------------------------------------------------------
# Systematic weighted sampling invariants (pure-model properties)
# ---------------------------------------------------------------------------


def _systematic_picks_model(weights: list[int], k: int):
    """Reference model of weighted_systematic_sample's selection rule."""
    total = sum(weights)
    picks, cum = [], 0
    for i, w in enumerate(weights):
        lo, cum = cum, cum + w
        if (lo * k) // total < (cum * k) // total:
            picks.append(i)
    return picks


@given(
    st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=300, deadline=None)
def test_systematic_sample_crosses_each_boundary_once(weights, k):
    """Exactly k stratum boundaries exist and each is crossed by exactly
    one row, so the pick count is <= k, > 0, and the total number of
    boundaries crossed over all picks is exactly k."""
    total = sum(weights)
    picks = _systematic_picks_model(weights, k)
    assert 0 < len(picks) <= k
    crossings = 0
    cum = 0
    for i, w in enumerate(weights):
        lo, cum = cum, cum + w
        if i in dict.fromkeys(picks):
            crossings += (cum * k) // total - (lo * k) // total
    assert crossings == k
    # a row heavier than one stratum MUST be picked (PPS property)
    for i, w in enumerate(weights):
        if w * k > total:
            assert i in picks, f"row {i} (w={w}) spans a stratum but missed"


# ---------------------------------------------------------------------------
# Priority sampling invariants (pure-model properties of the
# orders_priority_sample construction)
# ---------------------------------------------------------------------------


def _priority_sample_model(weights: list[int], k: int):
    """Reference model of orders_priority_sample's selection rule:
    pri = w/u01 with u01 from the salted md5 of the index, top-(k+1)
    with (pri desc, idx) tie-break, tau = the set's min, keep pri>tau."""
    import hashlib

    def u01(i: int) -> float:
        h = int(hashlib.md5(f"ps|{i}".encode()).hexdigest()[:15], 16) + 1
        return h / 2**60

    pri = {i: w / u01(i) for i, w in enumerate(weights)}
    top = sorted(pri, key=lambda i: (-pri[i], i))[: k + 1]
    tau = min(pri[i] for i in top)
    return {i for i in top if pri[i] > tau}, tau, pri


@given(
    st.lists(st.integers(min_value=1, max_value=10_000), min_size=5, max_size=300),
    st.integers(min_value=1, max_value=32),
)
@settings(max_examples=200, deadline=None)
def test_priority_sample_invariants(weights, k):
    picks, tau, pri = _priority_sample_model(weights, k)
    assert len(picks) <= k
    if len(weights) > k + 1:
        # distinct priorities (md5-derived, ties measure-zero) => full k
        assert len(picks) == k
    # certainty property: pri >= w (u01 <= 1), so any weight above tau
    # is guaranteed into the sample -- the heavy-item guarantee that
    # makes the estimator's variance collapse on skewed data
    for i, w in enumerate(weights):
        if w > tau:
            assert i in picks, f"item {i} (w={w} > tau={tau:.3g}) missed"
    # weight-monotonicity: growing a sampled item's weight (same u)
    # only improves its rank, so it stays sampled
    if picks:
        i0 = min(picks)
        boosted = list(weights)
        boosted[i0] *= 7
        picks2, _, _ = _priority_sample_model(boosted, k)
        assert i0 in picks2


@given(st.integers(min_value=1, max_value=2**62))
@settings(max_examples=500, deadline=None)
def test_bit_length_bucket_is_floor_log2(v):
    """The log2 bucket used by doc_length_log2_histogram and
    events_hdr_percentiles (bit length - 1) equals exact floor(log2)."""
    assert len(bin(v)) - 2 - 1 == v.bit_length() - 1
    lo, hi = 2 ** (v.bit_length() - 1), 2 ** v.bit_length()
    assert lo <= v < hi
