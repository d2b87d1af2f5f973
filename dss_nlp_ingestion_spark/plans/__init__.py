"""Named query plans.

Importing this package populates the registry (``QUERIES`` /
``ORACLES``) consumed by ``__spark_entry__.py``.
"""

from dss_nlp_ingestion_spark.plans.registry import ORACLES, QUERIES  # noqa: F401

# Import for registration side effects — each module registers its
# queries at import time.
from dss_nlp_ingestion_spark.plans import core_relational  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import text_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import dedup_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import similarity_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import nlp_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import multimodal_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import misc_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import sql_surface  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import rollup_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import fulltext_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import sampling_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import tpch_suite  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import analytics_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import curation_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import mining_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import scale_queries  # noqa: F401,E402
from dss_nlp_ingestion_spark.plans import series_queries  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Cost notes for every row that runs >2 s at sf0.1 (r8 verdict #8:
# heavy rows carry a documenting TAGS entry; bench.py records any
# violation under "untagged_heavy" and tests/test_rotation.py asserts
# the committed record is clean). setdefault: register-time tags win.
# ---------------------------------------------------------------------------
from dss_nlp_ingestion_spark.plans.registry import TAGS as _TAGS  # noqa: E402

for _name, _note in {
    "ann_recall_eval": (
        "composite eval row: exact brute force PLUS a full IVF rerun "
        "on the same queries — costs two searches by construction"
    ),
    "corpus_funnel_counts": (
        "single-pass multi-gate funnel over full document text "
        "(length/lang/quality/dedup counters share one scan)"
    ),
    "dsir_top_selection": (
        "scan-side hashed n-gram featurizer over full text + "
        "importance-weight ranking; cost is O(tokens), one shuffle"
    ),
    "dup_canonical_best": (
        "connected-components supersteps + per-cluster best pick: "
        "one job per pointer-jump round by design (log D rounds)"
    ),
    "dup_clusters": (
        "iterative connected components (small-star/large-star): "
        "superstep jobs by design; per-round data is edge-bounded"
    ),
    "dup_clusters_pj": (
        "pointer-jumping CC twin: log D superstep jobs by design "
        "(compared against dup_clusters for parity)"
    ),
    "fulltext_index_incremental": (
        "posting-list build + txlog commit + incremental merge — "
        "index lifecycle row, write IO dominates at toy SF"
    ),
    "hybrid_rrf_retrieval": (
        "composes BM25 retrieval AND embedding retrieval, then rank "
        "fusion — two full retrieval paths in one row by design"
    ),
    "kmeans_update_centroids": (
        "one Lloyd superstep incl. full-corpus assignment; "
        "assignment is scan-side, update is a k-row aggregate"
    ),
    "leakage_safe_splits": (
        "cluster-keyed split = near-dup clustering (CC supersteps) "
        "before the split assignment — clustering dominates"
    ),
    "matview_incremental_orders": (
        "materialized-view lifecycle: base commit + delta commit + "
        "incremental refresh + verification read (multi-commit IO)"
    ),
    "ngram_jaccard_dups_capped": (
        "df-capped postings self-join verifier — output-pair-bound; "
        "the banded path is the scale default"
    ),
    "pagerank_nation_trade": (
        "fixed 10 power-iteration supersteps = 10 join jobs by "
        "design; per-round data is edge-bounded"
    ),
    "reco_fallback_parts": (
        "three-level fallback (item/segment/global) — three "
        "aggregates + coalescing join in one row by design"
    ),
    "semdedup_prune": (
        "BLAS pandas centroid assignment (above the literal-plan "
        "budget) + per-cluster pruning; sound at scale, Arrow-bound "
        "at toy SF"
    ),
    "simhash_near_dups_banded": (
        "60-bit pigeonhole banding self-join — candidate-pair-bound "
        "verifier of the simhash family"
    ),
    "triangle_count_coparts": (
        "degree-oriented sorted-adjacency intersection (r8 rewrite): "
        "arboricity-bounded arrays, wedge set never materialized"
    ),
    "txlog_cdc_replicate_orders": (
        "CDC replication replay: N source commits -> N incremental "
        "applies by design (multi-commit IO at toy SF)"
    ),
    # Borderline rows (~1.5-2.4 s at sf0.1) that cross the 2 s tag
    # threshold under host-contention windows — notes so a noisy
    # sweep can't produce an untagged_heavy violation.
    "association_rules_confidence": (
        "basket self-join for pair supports — candidate-pair-bound "
        "market-basket kernel"
    ),
    "cent_exact_allocation": (
        "largest-remainder allocation = exact decimal aggregate + "
        "two rank windows by design"
    ),
    "dsir_importance_weights": (
        "scan-side hashed n-gram featurizer over full text (same "
        "cost class as dsir_top_selection)"
    ),
    "gdpr_cascade_delete": (
        "multi-table transactional delete cascade: one commit per "
        "referencing table (write IO at toy SF)"
    ),
    "kcore_copurchase_parts": (
        "iterative k-core peel: one degree-filter superstep per "
        "round until fixpoint, by design"
    ),
    "multitable_txn_snapshot": (
        "multi-table atomic txn vector: N table writes + snapshot "
        "reads in one row (commit IO at toy SF)"
    ),
    "copurchase_chi2_topk": (
        "basket pair supports + chi-square scoring — candidate-pair-"
        "bound market-basket kernel (same class as the lift/support "
        "twins)"
    ),
    "copurchase_lift_topk": (
        "basket pair supports + lift scoring — candidate-pair-bound"
    ),
    "copurchase_pairs_support": (
        "basket pair-support base table — candidate-pair-bound"
    ),
    "copurchase_triples_support": (
        "basket TRIPLE supports — candidate-triple-bound by design"
    ),
    "ngram_jaccard_dups": (
        "uncapped postings self-join — the small-sample exact "
        "verifier of the df-capped scale default (sf1 skip-listed)"
    ),
    "cogrouped_conversion_stats": (
        "applyInPandas cogroup demo on a 1/8 user slice — the "
        "documented Python-boundary compatibility path"
    ),
    "txlog_ivm_with_deletes": (
        "IVM through appends AND deletes: multi-commit lifecycle + "
        "signed-delta refresh (commit IO at toy SF)"
    ),
    "ancestor_closure_customers": (
        "recursive closure: one join superstep per hierarchy level "
        "until fixpoint, by design"
    ),
    "cjk_lsh_candidates": (
        "character-shingle MinHash banding for unsegmented text — "
        "shingle volume is chars, not words (denser postings)"
    ),
    "fulltext_topk": (
        "BM25 scoring join over the posting lists + top-k window "
        "(index-build IO shares the row at toy SF)"
    ),
    "fulltext_topk_cjk": (
        "BM25 over character-shingled CJK postings — denser lists "
        "than word tokens by design"
    ),
    "degree_distribution_log2": (
        "full trade-graph degree aggregation + log2 binning — one "
        "graph-wide shuffle by design"
    ),
    "incremental_lsh_dedup": (
        "batch-vs-corpus band-index probe: cost tracks the batch; "
        "fixture batch is corpus-sized by design"
    ),
    "triangle_edge_support": (
        "per-EDGE triangle supports (k-truss ingredient) — "
        "adjacency-intersection bound, heavier than the count-only "
        "twin by design"
    ),
    "media_decode_real": (
        "pure-python baseline-JPEG/PNG decode inside mapInPandas — "
        "the documented hermetic-container codec path (native seam "
        "exists)"
    ),
    # r11 host-window notes: rows measurably < 2 s in the r9 quiet
    # window and in idle spot-checks on the r11 host, whose bench
    # slots landed inside this host's multi-minute CPU-steal episodes
    # (observed 3-4x inflation on sub-second rows). Notes document
    # the window, not an operator cost change.
    "funnel_time_to_convert": (
        "3-step funnel over per-user ordered event lists (one "
        "user_id shuffle + codegen HOF scan) — 1.6 s r9 quiet / "
        "~2.8 s r11-host steady; crosses the 2 s audit line only "
        "under this host's CPU-steal factor"
    ),
    "lm_bigram_scores": (
        "corpus bigram-LM estimation + per-doc scoring in one row — "
        "1.7 s r9 quiet / ~2.5 s r11-host steady; borderline of the "
        "2 s audit line under this host's CPU-steal factor"
    ),
    "media_decode_stub": (
        "sub-second row (0.6-0.9 s steady, r9 0.60 s) whose r11 "
        "sweep AND solo slots both hit host-steal episodes; nothing "
        "operator-side exceeds the audit threshold"
    ),
    "txlog_merge_upsert_orders": (
        "file-pruned ACID MERGE measured end-to-end (commit IO at "
        "toy SF) — 1.6 s r9 quiet / ~2.7 s r11-host steady; "
        "borderline of the 2 s audit line under this host's "
        "CPU-steal factor"
    ),
}.items():
    _TAGS.setdefault(_name, _note)


def _query_code_hash(name: str) -> str:
    """Hash of a query's implementation source + the sources of the
    same-module helper FUNCTIONS it calls (one level) + oracle SQL —
    the identity the greenness cache is keyed on, so neither a
    rewritten query NOR an edited shared helper (e.g.
    basket_item_pairs, r5 review finding) can inherit a pre-edit
    green row."""
    import hashlib
    import inspect
    import sys

    fn = QUERIES[name]
    # Split composites (register_split) hash their real setup/probe
    # sources, not the thin wrapper in registry.py.
    targets = [fn, *getattr(fn, "_split", ())]
    parts = []
    for tgt in targets:
        try:
            parts.append(inspect.getsource(tgt))
        except (OSError, TypeError):
            parts.append(name)
        mod = sys.modules.get(getattr(tgt, "__module__", ""), None)
        code = getattr(tgt, "__code__", None)
        if mod is not None and code is not None:
            for ref in sorted(set(code.co_names)):
                helper = getattr(mod, ref, None)
                if inspect.isfunction(helper) and helper not in targets:
                    try:
                        parts.append(inspect.getsource(helper))
                    except (OSError, TypeError):
                        parts.append(ref)
    return hashlib.sha256(
        ("\x00".join(parts) + "\x00" + ORACLES.get(name, "")).encode()
    ).hexdigest()[:16]


def _rotate_for_driver_sample() -> None:
    """Order the registry so the driver's fixed-size sample verifies
    what most needs verifying, in priority order:

    1. queries with NO green row, or whose CODE CHANGED since their
       last green row (tracked via QUERY_HASHES.json: each entry
       records the source hash and the round from which a green row
       may count; a hash change bumps ``as_of_round`` past every
       existing CORRECTNESS file, invalidating stale greens);
    2. green queries, LEAST-recently-sampled first (stale greens get
       re-verified on a rolling basis instead of never).

    "Green" = the latest sampled row hash-matched (or, for rows-only
    queries, produced rows without error) AND that row is from a
    round >= the query's hash ``as_of_round``. Self-maintaining:
    QUERY_HASHES.json is refreshed here (atomic rename, best-effort);
    a missing/unreadable correctness file means no reordering."""
    import json
    import os
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    latest: dict[str, tuple[int, dict]] = {}  # name -> (round, row)
    max_round = 0
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)", p.name)
        rnd = int(m.group(1)) if m else 0
        max_round = max(max_round, rnd)
        try:
            for name, row in json.loads(p.read_text()).items():
                latest[name] = (rnd, row)
        except (OSError, ValueError, AttributeError):
            pass
    if not latest:
        return

    # Load / refresh the code-hash cache. An entry's green rows count
    # only from ``as_of_round`` onward; a changed hash sets that to
    # max_round + 1 (the upcoming round), forcing re-verification.
    hash_path = root / "QUERY_HASHES.json"
    try:
        cache = json.loads(hash_path.read_text())
        assert isinstance(cache, dict)
    except (OSError, ValueError, AssertionError):
        cache = {}
    changed = False
    for name in QUERIES:
        h = _query_code_hash(name)
        ent = cache.get(name)
        if not isinstance(ent, dict) or ent.get("hash") != h:
            # New or rewritten: count greens only from the next round.
            # (First-ever population grandfathers existing greens in —
            # as_of_round 0 — so the cache bootstrap doesn't mark the
            # whole registry dirty at once.)
            cache[name] = {"hash": h, "as_of_round": 0 if ent is None and not hash_path.exists() else max_round + 1}
            changed = True
    if changed:
        try:
            tmp = str(hash_path) + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(cache, fh, indent=0, sort_keys=True)
            os.replace(tmp, hash_path)
        except OSError:
            pass

    def _green_row(row: dict) -> bool:
        if not isinstance(row, dict):
            return False
        if row.get("hash_match") is True:
            return True
        # rows-only queries (no oracle): green iff sampled cleanly.
        return row.get("err") is None and row.get("spark_rows") is not None

    def _sort_key(name: str) -> tuple[int, int, int]:
        rnd, row = latest.get(name, (0, None))
        as_of = cache.get(name, {}).get("as_of_round", 0)
        is_green = row is not None and _green_row(row) and rnd >= as_of
        # Non-green first, ordered: (a) never-driver-sampled, (b)
        # rows whose LATEST driver result was an actual error —
        # r8 verdict #2: an errored row is a live correctness question
        # and must not queue behind hash-stale rows that were green
        # when last sampled — then (c) stale rows, oldest round first;
        # the stable sort keeps registration order within each tie.
        # (r5 verdict #1: the old constant tie left ALL non-green
        # queries in registration order, so the driver's 50-slot
        # sample re-verified r1-era core queries while 181
        # never-sampled ones waited.)  Green queries last,
        # oldest-sample-first.
        if is_green:
            return (1, 0, rnd)
        if row is None:
            return (0, 0, 0)  # never sampled
        errored = not _green_row(row)  # latest sampled row itself bad
        return (0, 1, rnd) if errored else (0, 2, rnd)

    order = sorted(QUERIES, key=_sort_key)  # stable sort
    for d in (QUERIES, ORACLES):
        reordered = {n: d[n] for n in order if n in d}
        d.clear()
        d.update(reordered)


_rotate_for_driver_sample()
