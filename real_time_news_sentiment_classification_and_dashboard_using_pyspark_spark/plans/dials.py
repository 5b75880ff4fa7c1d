"""Corpus-adaptive scale dials — consolidated (r10 verdict #4).

Every dial here turns a FIXED algorithm parameter into a function of
the corpus size, so an operator whose work or output would grow
super-linearly at a new scale degrades into a deterministic,
oracle-mirrorable restriction instead of a timeout or an unhashable
result. House rules, enforced by tests/test_dials.py:

- **No-op at every committed fixture.** Each dial returns its
  historical constant for all corpus sizes up to the largest committed
  fixture (sf1), so plans and result hashes at sf0.001..sf1 are
  bit-identical to the rounds that froze them.
- **Monotone in n.** More data never loosens a dial.
- **Slab-edge continuity.** Crossing a slab boundary changes the dial
  by the smallest step the formula allows — no cliffs that would make
  two near-identical corpora produce wildly different plans.
- **One count source per query.** A dial's `n` must come from the same
  count source on both engines (the parquet footer via
  `_parquet_total_count` / `_embeddings_total_count`, falling back to
  a Spark count only when the footer is unreadable), so the Spark plan
  and the DuckDB oracle provably resolve the same dial value.

The callable-oracle pattern these dials pair with lives next to each
query: the oracle is a function of sf_dir that resolves the same dial
from the same count and emits SQL with the dial inlined.
"""

from __future__ import annotations

import math

# ---------------------------------------------------------------------------
# Embedding-side pairwise corpus cap (r9 verdict #7; moved from
# similarity_queries in r11). Above _PAIRWISE_CAP vectors, the
# intrinsically O(n^2) exact-pairwise family and the banded-LSH family
# (whose OUTPUT grows ~quadratically on the replicated fixtures)
# restrict both engines to the same deterministic `vec_id % M` subset.
# Inactive at every committed fixture (sf0.001..sf1 <= 20,480 vectors
# -> M = 1); at sf10 (200k) M = 10 keeps the exact arm at sf1 scale.
# ---------------------------------------------------------------------------

_PAIRWISE_CAP = 20480


def _pair_cap_mod(n_vectors: int) -> int:
    return max(1, math.ceil(n_vectors / _PAIRWISE_CAP))


# ---------------------------------------------------------------------------
# Document-side pair-family corpus cap (NEW r11, the r10-verdict #1
# treatment for the simhash pair family). The verified SimHash pair
# OUTPUT grows ~quadratically on the replicated doc fixtures (10.3 M
# rows at sf10 for 32-bit), and the DuckDB oracle's 32/64-aggregate
# vote pass over the full shingle relation is infeasible there
# (>900 s) while Spark answers in ~100 s. Above _DOC_PAIR_CAP base
# documents both engines restrict the corpus to the same deterministic
# `(doc_id % 1e6) % M` subset — the BASE-id form (same predicate shape
# as the recall evals' `_EVAL_SAMPLE_SQL`) keeps every original
# together with its near-dup twin (twin doc_id = base + 1e6), so
# near-dup pairs survive the cap intact; only the corpus shrinks.
# Inactive at every committed fixture: sf1 = 50,000 docs -> M = 1;
# at sf10 (500k) M = 10 restricts both engines to sf1 scale, where
# the oracle completes in ~40 s.
# ---------------------------------------------------------------------------

_DOC_PAIR_CAP = 50_000


def _doc_cap_mod(n_docs: int) -> int:
    return max(1, math.ceil(n_docs / _DOC_PAIR_CAP))


# ---------------------------------------------------------------------------
# Heavy-pair-family corpus cap (NEW r12, the sf100 rendering of the
# same treatment). The minhash/ngram/winnowing pair families stayed
# UNCAPPED through sf10 by design — their oracles completed there
# (72/329/157 s) — but at sf100 (5 M base docs) the DuckDB side's
# full-corpus tokenize + pair CTEs exceed any budget and ballooned
# past 100 GB (r12 probe: OOM). Same base-id predicate and twin
# preservation as `_doc_cap_mod`, with a 10x-larger slab so the dial
# is a no-op at EVERY previously-verified scale (sf0.001..sf10 ->
# M = 1, all r11 hashes frozen); at sf100 M = 10 restricts both
# engines to exactly sf10 scale, where the hash contract is proven.
# Capped semantics are self-consistent: stop/df cutoffs recompute over
# the capped corpus on BOTH engines (declared degradation, mirrored
# predicate, never silent truncation).
# ---------------------------------------------------------------------------

_HEAVY_PAIR_CAP = 500_000


def _heavy_pair_cap_mod(n_docs: int) -> int:
    return max(1, math.ceil(n_docs / _HEAVY_PAIR_CAP))


# ---------------------------------------------------------------------------
# Embeddings-side heavy cap (NEW r12): the same idea for
# corpus-level vector operators whose cell-count dial keeps occupancy
# constant (cells ∝ n) — which makes broadcast assignment work
# n x cells ∝ n², quadratic. At sf100 `semantic_dedup`'s 2M x 1568
# assignment sort (3.1G rows) exhausted disk spill. No-op through
# sf10 (200k vectors, every previously-verified scale); M = 10 at
# sf100 restricts to exactly sf10 scale. Plain `vec_id % M` predicate
# (the embedding families' sample form — embeddings have no twin-id
# convention).
# ---------------------------------------------------------------------------

_EMB_HEAVY_CAP = 200_000


def _emb_heavy_cap_mod(n_vectors: int) -> int:
    return max(1, math.ceil(n_vectors / _EMB_HEAVY_CAP))


# ---------------------------------------------------------------------------
# Text-family oracle-feasibility corpus cap (NEW r13). The trigram /
# token LM oracles materialize a per-character or per-token relation
# of the WHOLE corpus in one DuckDB process (`tri AS MATERIALIZED`):
# ~5 B rows at sf100 (5 M docs), which exceeded the 55 GB /tmp spill
# even before memory (r13 probe: lang_id_trigram oracle died on
# spill-disk-full at 799 s). The Spark side needs no cap — the trigram
# stream is a map-side explode that never materializes (the same probe
# completed the Spark leg). Same slab + semantics as
# `_heavy_pair_cap_mod`: no-op through sf10 (500k docs, every
# previously hash-verified scale), M=10 at sf100 restricts BOTH
# engines to exactly sf10 corpus scale via a plain `doc_id % M = 0`
# predicate (text family reads raw documents — no twin-band id
# convention to preserve). Capped semantics are self-consistent:
# train/test split and profiles recompute over the capped corpus on
# both engines.
# ---------------------------------------------------------------------------

_TEXT_ORACLE_CAP = 500_000


def _text_corpus_cap_mod(n_docs: int) -> int:
    return max(1, math.ceil(n_docs / _TEXT_ORACLE_CAP))


# ---------------------------------------------------------------------------
# Event-side sessionization corpus cap (NEW r13). `event_sessions`
# emits one row per (user, session) — output ∝ events (9.55 M rows at
# sf10, verified; ~95 M at sf100, where the COLLECTED result alone
# exceeds any driver/oracle budget: the sf100 probe died on
# spark.driver.maxResultSize at 2.2 GiB of serialized task results).
# Sessionization is windowed strictly per user_id, so a user-slab
# restriction (`user_id % M = 0`) is exact — every kept user's
# sessions are computed over that user's complete event history; only
# the set of users shrinks. No-op at every previously-verified scale
# (sf0.001..sf10 <= 10 M events -> M = 1, all r11/r13 hashes frozen);
# at sf100 (100 M events) M = 10 restricts both engines to exactly
# sf10 output scale, where the hash contract is proven.
# ---------------------------------------------------------------------------

_EVENT_SESSION_CAP = 10_000_000


def _event_user_cap_mod(n_events: int) -> int:
    return max(1, math.ceil(n_events / _EVENT_SESSION_CAP))


# ---------------------------------------------------------------------------
# Hyperplane-LSH bucket width (single-table family). Target ~80 rows
# per bucket, floor 8 bits: bits = max(8, ceil(log2(n/80))). Inactive
# at every committed fixture (n <= 20480 -> 8 bits); at 100 TB it is
# the dial that keeps per-bucket verify work (occupancy^2 inside one
# Arrow task) bounded as the corpus grows — candidates scale
# ~n * occupancy instead of n^2/2^8.
# ---------------------------------------------------------------------------


def _lsh_bits(n_vectors: int) -> int:
    return max(8, math.ceil(math.log2(max(n_vectors, 1) / 80.0)))


# ---------------------------------------------------------------------------
# SemDeDup cell count, scaled so per-cell all-pairs work stays bounded:
# K = 16 per _PAIRWISE_CAP-sized slab (target cell occupancy ~1.3k
# vectors). 16 at every committed fixture; 160 at sf10 — without this,
# 200k vectors in 16 cells meant 12.5k^2 sims per cell (measured 33x
# the sf1 time before the r10 fix).
# ---------------------------------------------------------------------------

_SEMDEDUP_K = 16


def _semdedup_k(n_vectors: int) -> int:
    return _SEMDEDUP_K * _pair_cap_mod(n_vectors)


# ---------------------------------------------------------------------------
# Fuzzy-match blocking-suffix length, scaled with the corpus: name
# suffixes are digits, so a k-char block key yields ~10^k blocks and
# per-block candidate volume ~ n_s * n_c / 10^k. One more suffix
# character per 10x customers keeps per-block volume flat: 3 at every
# committed fixture (<= 200k customers), 4 at sf10 (1.5M). Blocking on
# a longer shared suffix is the standard recall/cost trade of entity
# resolution at scale (measured 37x -> 2.4x at sf10, r10).
# ---------------------------------------------------------------------------

_FUZZY_BLOCK_BASE_N = 200_000


def _fuzzy_block_len(n_customers: int) -> int:
    if n_customers <= _FUZZY_BLOCK_BASE_N:
        return 3
    return 3 + math.ceil(math.log10(n_customers / _FUZZY_BLOCK_BASE_N))
