"""Batched BPE trainer (queries/curation._bpe_train_batched): local-maxima
batch selection pinned against the sequential trainer's semantics.

The exactness claims under test (see the module comment in curation.py):
  * batch-of-1 reproduces the sequential merge sequence EXACTLY;
  * within a sweep the selected pairs are pairwise symbol-disjoint, and
    each recorded pair_count equals the count a sequential replay sees at
    that merge's application point (disjoint merges can't change each
    other's counts);
  * where batched and sequential DIVERGE (a merged symbol's brand-new
    pairs competing mid-sweep) is documented, not hidden — the divergence
    test constructs it on purpose.
"""

import itertools
import os

from pyspark.sql import functions as F  # noqa: F401  (parity with suite style)


def _write_docs(spark, tmp_path, rows):
    p = os.path.join(str(tmp_path), "documents.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    return str(tmp_path)


# -- pure-python reference (greedy leftmost non-overlapping, the package's
# replace-arithmetic convention) -------------------------------------------

def _py_state(words: dict[str, int]) -> dict[str, int]:
    return {
        "  " + "  ".join(w) + "  ": cnt for w, cnt in words.items()
    }


def _py_count(state: dict[str, int], l: str, r: str) -> int:
    pat = f" {l}  {r} "
    return sum(
        wcnt * ((len(s) - len(s.replace(pat, ""))) // len(pat))
        for s, wcnt in state.items()
    )


def _py_apply(state: dict[str, int], l: str, r: str) -> dict[str, int]:
    pat, rep = f" {l}  {r} ", f" {l}{r} "
    out: dict[str, int] = {}
    for s, wcnt in state.items():
        out[s.replace(pat, rep)] = out.get(s.replace(pat, rep), 0) + wcnt
    return out


def test_bpe_batched_cap1_equals_sequential(spark, tmp_path):
    """batch_cap=1 degenerates to the sequential trainer: the sweep's
    single survivor of the local-maxima rule + top-1 cut IS the global
    (count DESC, l, r) argmax, and with one merge per sweep there are no
    mid-sweep new-symbol pairs to diverge on."""
    from mcp_local_rag_spark.queries.curation import (
        _bpe_train,
        _bpe_train_batched,
    )

    rows = [
        (1, "banana bandana ban and anna", "en", "s", 27),
        (2, "banana and anna and ban", "en", "s", 23),
        (3, "bandana banana", "en", "s", 14),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    seq, _, w1 = _bpe_train(spark, sf_dir, rounds=6)
    bat, _, w2 = _bpe_train_batched(spark, sf_dir, sweeps=6, batch_cap=1)
    w1.unpersist()
    w2.unpersist()
    assert [(l, r, m, c) for _, l, r, m, c in bat] == [
        (l, r, m, c) for _, l, r, m, c in seq
    ]
    assert [s for s, *_ in bat] == list(range(1, len(bat) + 1))


import pytest


@pytest.mark.parametrize("select", ["local_maxima", "greedy"])
def test_bpe_batched_counts_are_sequential_exact_and_disjoint(
    spark, tmp_path, select
):
    """Within each sweep, for BOTH selection strategies: (a) selected
    pairs are pairwise symbol-disjoint; (b) every recorded pair_count
    equals the python reference count on the sweep's snapshot state AND
    on the state with all prior in-sweep merges applied — the two are
    equal precisely because the batch is disjoint, so the recorded count
    is exactly what a sequential replay performs."""
    from mcp_local_rag_spark.queries.curation import _bpe_train_batched

    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "s", 44),
        (2, "pack my box with five dozen liquor jugs", "en", "s", 40),
        (3, "the five boxing wizards jump quickly", "en", "s", 36),
        (4, "how vexingly quick daft zebras jump", "en", "s", 36),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    merges, _, words = _bpe_train_batched(
        spark, sf_dir, sweeps=3, batch_cap=8, select=select
    )
    base = {
        r["w"]: r["wcnt"] for r in words.select("w", "wcnt").collect()
    }
    words.unpersist()
    assert merges, "trainer learned nothing"

    state = _py_state(base)
    for sweep in sorted({s for s, *_ in merges}):
        batch = [(l, r, c) for s, l, r, _m, c in merges if s == sweep]
        # (a) pairwise symbol-disjoint
        seen: set[str] = set()
        for l, r, _c in batch:
            assert l not in seen and r not in seen, (sweep, batch)
            seen.update((l, r))
        # (b) counts exact on the snapshot AND under sequential replay
        replay = dict(state)
        for l, r, c in batch:
            assert _py_count(state, l, r) == c, (sweep, l, r)
            assert _py_count(replay, l, r) == c, (sweep, l, r)
            replay = _py_apply(replay, l, r)
        state = replay


def test_bpe_batched_divergence_from_sequential_is_the_documented_one(
    spark, tmp_path
):
    """Construct the divergence on purpose: sequential merges (a,b), then
    immediately rides the new symbol — (ab,c) wins round 2. The batched
    sweep only sees the snapshot pairs, so (ab,c) cannot compete until the
    NEXT sweep; its sweep-1 batch contains snapshot pairs only."""
    from mcp_local_rag_spark.queries.curation import (
        _bpe_train,
        _bpe_train_batched,
    )

    # 'abc' dominant: (a,b)=(b,c)=N, after 'ab' merge (ab,c)=N wins round
    # 2 sequentially. 'de' gives the batch a second disjoint snapshot
    # pair so the sweep-1 batch is {(a,b), (d,e)} while sequential round
    # 2 picks (ab,c) — materially different second merges.
    rows = [
        (1, " ".join(["abc"] * 9 + ["de"] * 7), "en", "s", 50),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    seq, _, w1 = _bpe_train(spark, sf_dir, rounds=2)
    bat, _, w2 = _bpe_train_batched(spark, sf_dir, sweeps=1, batch_cap=8)
    w1.unpersist()
    w2.unpersist()
    assert [(l, r) for _, l, r, _m, _c in seq] == [("a", "b"), ("ab", "c")]
    assert [(l, r) for _, l, r, _m, _c in bat] == [("a", "b"), ("d", "e")]
    # and the batched counts are still snapshot-exact
    assert [c for *_x, c in bat] == [9, 7]


def test_bpe_batched_reaches_256_merges_in_32_sweeps(spark):
    """The depth target (VERDICT r13 item 3): >=256 merges in <=32 sweeps
    — the job-wave count is ~vocab/batch, not one wave per merge. Runs on
    an injected syllable vocabulary (the sf documents table holds only 31
    distinct words, max 107 merges)."""
    from mcp_local_rag_spark.queries.curation import _bpe_train_batched

    syll = [
        "ba", "ke", "lo", "mi", "ru", "ta", "zu", "en", "po", "qi", "vy", "wa",
    ]
    vocab = ["".join(c) for c in itertools.product(syll, repeat=3)]
    rows = [
        (w, "  " + "  ".join(w) + "  ", 1 + (i * 7) % 37)
        for i, w in enumerate(vocab)
    ]
    words = spark.createDataFrame(rows, "w string, s string, wcnt long")
    merges, _, base = _bpe_train_batched(
        spark,
        None,
        sweeps=32,
        batch_cap=32,
        max_merges=256,
        words=words,
        select="greedy",
    )
    base.unpersist()
    assert len(merges) >= 256
    assert max(s for s, *_ in merges) <= 32


@pytest.mark.parametrize("select", ["local_maxima", "greedy"])
def test_bpe_batched_multibracketing_collision_guard(spark, select):
    """r14 self-review: symbol disjointness alone is not enough — pair
    ('a','ba') CONCATENATES to 'aba', so applying it creates brand-new
    ' aba  c ' adjacencies and a same-sweep pair ('aba','c') would record
    a count the replay immediately contradicts. The guard must defer
    ('aba','c') to the NEXT sweep, where it counts the post-merge truth."""
    from mcp_local_rag_spark.queries.curation import _bpe_train_batched

    # injected state: 'aba' already a symbol (earlier ('ab','a')-style
    # derivation); ('a','ba') outranks ('aba','c') by count
    rows = [
        ("w1", "  a  ba  c  ", 7),   # 7x ' a  ba ' and, post-merge, ' aba  c '
        ("w2", "  aba  c  ", 6),     # 6x ' aba  c ' in the snapshot
        ("w3", "  a  ba  q  ", 1),   # keeps ('a','ba') strictly best for 'a'
    ]
    words = spark.createDataFrame(rows, "w string, s string, wcnt long")
    merges, _, base = _bpe_train_batched(
        spark, None, sweeps=2, batch_cap=8, words=words, select=select
    )
    base.unpersist()
    by_sweep: dict = {}
    for s, l, r, _m, c in merges:
        by_sweep.setdefault(s, []).append((l, r, c))
    assert ("a", "ba", 8) in by_sweep[1]
    # the colliding pair is NOT in sweep 1 ...
    assert all((l, r) != ("aba", "c") for l, r, _ in by_sweep[1])
    # ... and lands in sweep 2 with the post-merge count: w2's 6 plus the
    # 7 new adjacencies the ('a','ba') merge created in w1
    assert ("aba", "c", 13) in by_sweep.get(2, [])


def test_bpe_batched_guard_keeps_replay_exactness_on_collision(spark):
    """The full invariant of the counts test, on the collision fixture:
    with the guard, every recorded count still equals the python replay."""
    from mcp_local_rag_spark.queries.curation import _bpe_train_batched

    rows = [
        ("w1", "  a  ba  c  ", 7),
        ("w2", "  aba  c  ", 6),
        ("w3", "  a  ba  q  ", 1),
    ]
    words = spark.createDataFrame(rows, "w string, s string, wcnt long")
    merges, _, base = _bpe_train_batched(
        spark, None, sweeps=3, batch_cap=8, words=words, select="greedy"
    )
    base.unpersist()
    state = {s: c for _w, s, c in rows}
    for sweep in sorted({s for s, *_ in merges}):
        for _s, l, r, _m, c in (m for m in merges if m[0] == sweep):
            pat = f" {l}  {r} "
            got = sum(
                wc * ((len(s) - len(s.replace(pat, ""))) // len(pat))
                for s, wc in state.items()
            )
            assert got == c, (sweep, l, r, got, c)
            nxt: dict = {}
            for s, wc in state.items():
                t = s.replace(pat, f" {l}{r} ")
                nxt[t] = nxt.get(t, 0) + wc
            state = nxt
