"""Property fuzz for the r7 tiers, following the corpus-independent
discipline of tests/test_oracle_fuzz.py: the blocked index probe must
equal brute force on ARBITRARY fingerprint sets (not just the
engineered corpus), the audio fingerprint's claimed invariances must
hold on random signals, and the JVM ADC expression must agree with
its numpy definition bit-for-bit on random codes."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from web3_flight_rpc_server_spark.multimodal.neardup import (
    _audio_fp_bits,
    _bits_to_i64,
)

I64 = st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    fps=st.lists(I64, min_size=2, max_size=16, unique=True),
    radius=st.integers(min_value=0, max_value=12),
)
def test_fp_index_probe_equals_brute_force_on_random_sets(
        spark, tmp_path_factory, fps, radius):
    """Pigeonhole exactness of the PERSISTENT index path on arbitrary
    64-bit fingerprints: index the even positions, probe the odd, and
    the result must equal brute-force Hamming over the cross pairs."""
    from web3_flight_rpc_server_spark.operators.fp_index import (
        dedup_fingerprints_against_index,
        write_fingerprint_index,
    )

    path = str(tmp_path_factory.mktemp("fuzz") / "idx")
    idx = [(i, v) for i, v in enumerate(fps) if i % 2 == 0]
    probe = [(i, v) for i, v in enumerate(fps) if i % 2 == 1]
    write_fingerprint_index(
        spark.createDataFrame(idx, "media_id long, phash long"),
        path, max_hamming=radius,
    )
    got = {(r.new_id, r.idx_id, r.hamming)
           for r in dedup_fingerprints_against_index(
               spark.createDataFrame(probe, "media_id long, phash long"),
               path).collect()}
    want = {
        (pi, ii, bin((pv ^ iv) & (2 ** 64 - 1)).count("1"))
        for pi, pv in probe for ii, iv in idx
        if bin((pv ^ iv) & (2 ** 64 - 1)).count("1") <= radius
    }
    assert got == want


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10 ** 6),
    gain=st.floats(min_value=0.05, max_value=0.95),
    pad_l=st.integers(min_value=0, max_value=4000),
    pad_r=st.integers(min_value=0, max_value=4000),
)
def test_audio_fp_gain_and_padding_invariance(seed, gain, pad_l, pad_r):
    """The module's EXACT claims, on random multi-tone signals: a
    constant gain and zero-padding leave the fingerprint unchanged
    (the double difference cancels the gain's log constant; the
    silence trim removes the pads)."""
    rng = np.random.default_rng(seed)
    rate = 8000
    seg = rate // 5
    segs = []
    for _ in range(9):
        f1, f2 = rng.uniform(150, 3500, 2)
        t = np.arange(seg) / rate
        segs.append(0.5 * np.sin(2 * np.pi * f1 * t)
                    + 0.3 * np.sin(2 * np.pi * f2 * t))
    pcm = np.concatenate(segs)
    base = _audio_fp_bits(pcm, rate)
    assert base is not None
    mutated = np.concatenate([np.zeros(pad_l), pcm * gain, np.zeros(pad_r)])
    got = _audio_fp_bits(mutated, rate)
    assert got is not None
    assert _bits_to_i64(got) == _bits_to_i64(base)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(min_value=0, max_value=10 ** 6))
def test_adc_expression_matches_numpy(spark, seed):
    """The JVM element_at ADC score equals the numpy table-lookup
    definition on random codebooks/codes/queries (IEEE doubles both
    sides, same summation order per subvector)."""
    from web3_flight_rpc_server_spark.operators.pq import (
        _adc_score,
        pq_topk,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(seed)
    m, k, sub = 4, 8, 4
    books = rng.normal(size=(m, k, sub))
    q = rng.normal(size=m * sub)
    codes = [[int(c) for c in rng.integers(0, k, m)] for _ in range(12)]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(codes)],
        "vec_id long, codes array<int>",
    )
    got = {r.vec_id: r.score for r in df.select(
        "vec_id", _adc_score("codes", q, books).alias("score")
    ).collect()}
    table = np.einsum("mkd,md->mk", books, q.reshape(m, sub))
    for i, c in enumerate(codes):
        want = 0.0
        for j in range(m):
            want = want + table[j][c[j]]
        assert got[i] == pytest.approx(want, abs=0.0), (
            f"codegen ADC diverged from numpy at row {i}"
        )
    # and the top-k ordering is the numpy ordering with id tie-break
    top = [r.vec_id for r in pq_topk(df, q, books, k=5).collect()]
    scores = [sum(table[j][c[j]] for j in range(m)) for c in codes]
    want_top = sorted(range(12), key=lambda i: (-scores[i], i))[:5]
    assert top == want_top
