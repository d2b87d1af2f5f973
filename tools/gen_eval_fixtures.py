"""Grow the four NLP held-out eval fixtures with ADVERSARIAL cases
(r8 verdict #3): the r8 sets saturated at 1.0000 on n=40/24/32/8 —
and the r8 advisor showed the sentiment gains came from closing
training-vocabulary gaps against the FIXED eval set, so the metric
measured eval-vocab coverage, not generalization. This regenerates
each eval as (original items) + ~4x new items built to probe what
the shipped bag-of-words-family artifacts genuinely cannot shortcut:

- sentiment: negation flips, contrastive sentences, UNSEEN-vocabulary
  sentiment words (filtered OOV against the training corpus at
  generation time), sarcasm-adjacent and oblique/no-sentiment-word
  sentences;
- topic: cross-class distractor vocabulary (a storage sentence that
  mentions queries, a streaming sentence that mentions joins, ...);
- encoder: mixed-cluster queries (majority tokens from the gold
  cluster, minority from the cluster it shares tokens with) plus
  never-seen filler tokens;
- keywords: OOV distractor terms with term frequencies at or above
  the gold terms' (a corpus-IDF model has no signal to separate two
  OOV terms — honest headroom, not a trick).

Deterministic (no RNG): itertools products sliced in fixed order.
Re-run: python tools/gen_eval_fixtures.py  (rewrites the four
tests/fixtures/*_eval.json in place; originals are preserved as the
prefix of each list). Then: python tools/nlp_eval.py --write.
"""

from __future__ import annotations

import itertools
import json
import os

FIX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
)


def _load(name):
    with open(os.path.join(FIX, name)) as fh:
        return json.load(fh)


def _dump(name, data):
    with open(os.path.join(FIX, name), "w") as fh:
        json.dump(data, fh, indent=1, ensure_ascii=False)
        fh.write("\n")


# --- sentiment -------------------------------------------------------------

#: candidate unseen sentiment vocabulary; filtered to words truly OOV
#: against the training corpus at generation time.
_POS_CAND = [
    "mesmerizing", "riveting", "exquisite", "soaring", "sublime",
    "vibrant", "immersive", "dazzling", "enthralling", "captivating",
    "exhilarating", "resplendent", "transcendent", "spellbinding",
    "ravishing", "magnetic",
]
_NEG_CAND = [
    "insufferable", "aimless", "muddled", "shrill", "interminable",
    "charmless", "turgid", "listless", "grueling", "soporific",
    "cloying", "ponderous", "vapid", "dreadfully", "insipid",
    "laborious",
]


def gen_sentiment():
    orig = _load("sentiment_eval.json")
    train = _load("sentiment_corpus.json")
    train_texts = {t for t, _ in train}
    vocab = {tok for t, _ in train for tok in t.lower().split()}
    pos = [w for w in _POS_CAND if w not in vocab]
    neg = [w for w in _NEG_CAND if w not in vocab]
    assert len(pos) >= 12 and len(neg) >= 12, (len(pos), len(neg))

    out = []
    # 1. plain unseen-vocabulary sentences (the generalization probe)
    for w in pos[:12]:
        out.append((f"the whole picture felt {w} from start to finish", 1))
    for w in neg[:12]:
        out.append((f"the whole picture felt {w} from start to finish", 0))
    # 2. negation flips (structure the BoW featurizer cannot see)
    for w in pos[:10]:
        out.append((f"the film was not {w} in any way whatsoever", 0))
    for w in neg[:10]:
        out.append((f"never once {w} and all the better for it", 1))
    # 3. contrastive sentences — final clause carries the verdict
    for wp, wn in zip(pos[:10], neg[:10]):
        out.append((f"the cast was {wp} but the script stayed {wn} to the end", 0))
        out.append((f"a {wn} opening yet the finale turned {wp} and won me over", 1))
    # 4. sarcasm-adjacent (surface-positive tokens, negative intent)
    sarcasm = [
        ("oh wonderful another remake nobody on earth asked for", 0),
        ("how brave of the studio to release something this unfinished", 0),
        ("truly amazing that a story can go nowhere for two hours", 0),
        ("what a delight to watch paint dry in premium format", 0),
        ("brilliant idea to cut the only interesting subplot", 0),
        ("superb work if the goal was to empty the theater", 0),
        ("a masterpiece of wasted talent and squandered budget", 0),
        ("impressive how every joke lands flat without exception", 0),
        ("stunning commitment to the least interesting choice every time", 0),
        ("glorious proof that money cannot buy a script", 0),
    ]
    out += sarcasm
    # 5. oblique — no sentiment vocabulary at all, situational polarity
    oblique = [
        ("i checked my phone through the entire second act", 0),
        ("i forgot the theater existed until the lights came up", 1),
        ("we left before the credits and nobody objected", 0),
        ("the audience sat in silence long after it ended then applauded", 1),
        ("i kept doing mental arithmetic about the runtime", 0),
        ("i bought another ticket for the next showing on my way out", 1),
        ("half the row was asleep by the car chase", 0),
        ("strangers were quoting lines to each other in the lobby", 1),
        ("i remembered i had laundry to fold and felt relieved", 0),
        ("three days later the final scene is still with me", 1),
        ("the most exciting part was finding my seat", 0),
        ("my popcorn went untouched because i could not look away", 1),
        ("i drafted a grocery list during the love scene", 0),
        ("the drive home was silent because nobody wanted to break the spell", 1),
        ("the exit signs became the most compelling thing on screen", 0),
        ("we stayed through the credits hoping for one more minute", 1),
    ]
    out += oblique
    # 6. mixed-signal: quantity of praise words vs one decisive negation
    for wp in pos[:6]:
        out.append(
            (f"{wp} visuals {wp} score {wp} costumes and yet i felt nothing at all", 0)
        )
    for wn in neg[:6]:
        out.append(
            (f"a {wn} premise on paper that somehow works completely on screen", 1)
        )

    new = [[t, y] for t, y in out if t not in train_texts]
    assert len(new) == len(out), "generated text collided with training corpus"
    seen = {t for t, _ in orig}
    new = [p for p in new if p[0] not in seen]
    return orig + new


# --- topic -----------------------------------------------------------------

def gen_topic():
    orig = _load("topic_eval.json")
    train_texts = {t for t, _ in _load("topic_corpus.json")}
    # class 0 = query execution, 1 = streaming, 2 = storage/table mgmt.
    # Every sentence name-drops ANOTHER class's vocabulary so the
    # rule-density heuristic (and a BoW model leaning on single
    # anchor words) has to weigh, not match.
    c0 = [
        "the optimizer rewrites the streaming view into a plain scan with a filter",
        "join reordering matters more than compaction for this workload",
        "cardinality estimates decide whether the snapshot scan uses the index",
        "the planner pushes the predicate below the window aggregate",
        "a broadcast join beats a shuffle when the dimension fits in memory",
        "cost based pruning skips partitions the checkpoint never touches",
        "the executor pipelines the hash probe with the parquet scan",
        "selectivity statistics pick the sort merge strategy over hash",
        "rewriting the correlated subquery as a join halves the plan depth",
        "the scan vectorizes the filter before any stream of rows reaches the sink",
        "runtime adaptive execution re plans the skewed join mid query",
        "the optimizer folds constants before the storage layer sees the scan",
        "an index only plan answers the lookup without touching row files",
        "dynamic partition pruning turns the fact scan into a handful of reads",
        "whole stage code generation fuses filter project and join into one loop",
        "the planner chooses a semi join to answer the exists predicate",
        "bloom filters from the build side prune the probe side scan",
        "spilling the hash table to disk keeps the join within memory bounds",
        "reordering predicates by cost makes the cheap filter run first",
        "the cost model prefers a merge join when both inputs arrive sorted",
        "statistics staleness sends the optimizer down a nested loop disaster",
        "limit pushdown stops the scan after the first matching records",
        "the query compiles to a plan that streams rows without materializing",
        "common subexpression elimination computes the shared filter once",
        "partition wise joins avoid the shuffle when buckets already align",
        "the planner inlines the view so the predicate reaches the base scan",
        "a covering index turns the three way join into two lookups",
        "skew handling splits the hot key across parallel probe tasks",
        "projection pruning drops unused columns before the join builds",
        "the execution engine shares one scan between both aggregate branches",
        "estimating distinct counts wrong flips the build and probe sides",
        "the plan cache reuses the compiled join for the repeated query",
    ]
    c1 = [
        "the watermark lags the slowest partition so the join state keeps growing",
        "a late event reopens the session window after the snapshot was taken",
        "checkpoint intervals trade replay time against steady throughput",
        "backpressure from the sink slows the source offsets to a crawl",
        "the stream stream join buffers both sides until the watermark passes",
        "exactly once delivery needs the sink commit to join the checkpoint",
        "restarting from the offset log replays the window that never closed",
        "event time ordering breaks when one kafka partition stalls",
        "the session gap closes and the aggregate finally emits downstream",
        "state store growth tracks the number of open windows not the files",
        "allowed lateness keeps the pane alive after the watermark moves on",
        "the micro batch drains the queue before the next trigger fires",
        "rebalancing the consumer group replays a few committed records",
        "watermark alignment across two sources gates the interval join",
        "the changelog stream compacts keys while the window still updates",
        "a stalled task holds the global watermark and every window waits",
        "side outputs route the too late events away from the main pane",
        "the trigger fires on processing time while results stay event time",
        "draining the pipeline flushes every open window before shutdown",
        "duplicate offsets after failover are dropped by the idempotent sink",
        "per key state ttl expires sessions the source stopped feeding",
        "the aggregation emits partial results that the retraction corrects",
        "throughput collapses when the state backend hits the disk",
        "windows fire out of order but the sink sequences them by pane",
        "the source rewinds two checkpoints because the sink never acked",
        "slow consumers force the broker to spill the backlog to disk",
        "a rescaled job repartitions its keyed state before resuming",
        "the interval join drops the match that arrived a second too late",
        "monitoring watermark skew catches the stuck partition early",
        "the pipeline upgrades in place by restoring the savepoint state",
        "batch queries over the stream read the materialized changelog",
        "keyed timers wake the operator to close the idle sessions",
    ]
    c2 = [
        "compaction folds the small files the streaming job keeps committing",
        "the manifest lists every data file the snapshot query may scan",
        "schema evolution adds the column without rewriting committed files",
        "time travel reads the table as of the snapshot before the merge",
        "row level deletes tombstone records until compaction rewrites them",
        "the commit protocol serializes writers through an atomic log append",
        "partition evolution changes the layout for new files only",
        "vacuum removes the unreferenced files after the retention horizon",
        "concurrent writers conflict when their commits touch the same partition",
        "the transaction log replays to the latest consistent table state",
        "clustering the files by key range lets the query skip most of them",
        "a checkpoint of the log folds a thousand json commits into one",
        "copy on write rewrites the file while merge on read defers it",
        "the table format tracks column stats so scans prune by min and max",
        "orphan files from failed commits never appear in the manifest",
        "snapshot isolation lets the long query ignore the new commits",
        "bucketing the table by join key removes the shuffle downstream",
        "the delete vector marks rows dead without touching the parquet",
        "retention policy expires old snapshots and their exclusive files",
        "sorting within files makes the zone maps worth consulting",
        "a branch of the table stages the backfill before the fast forward",
        "metadata only queries answer the row count from the manifest",
        "the writer salts file names so retries never collide in the log",
        "converting the directory table brings its files under the log",
        "tags pin the quarterly snapshot the audit queries will read",
        "small file compaction batches by partition to respect the quota",
        "the log records schema id per file so old readers stay correct",
        "streaming ingestion commits every interval and the table stays queryable",
        "rewriting the hot partition re clusters it by the new key",
        "the catalog swaps the table pointer only after the commit lands",
        "stats collection after compaction refreshes the pruning bounds",
        "a shallow clone shares data files and diverges only in the log",
    ]
    out = (
        [[t, 0] for t in c0] + [[t, 1] for t in c1] + [[t, 2] for t in c2]
    )
    for t, _ in out:
        assert t not in train_texts, t
    seen = {t for t, _ in orig}
    out = [p for p in out if p[0] not in seen]
    return orig + out


# --- encoder ---------------------------------------------------------------

def gen_encoder():
    orig = _load("encoder_eval.json")
    train = _load("encoder_corpus.json")
    train_texts = {t for t, _ in train}
    # cluster c's token set: lo = 4 tokens 4c..4c+3 overlap with the
    # partner cluster (c+8) via the hi range 32+4c..32+4c+3.
    def toks(c):
        if c < 8:
            return [f"tok{4*c+j:02d}" for j in range(4)], [
                f"tok{32+4*c+j:02d}" for j in range(2)
            ]
        b = c - 8
        return [f"tok{32+4*b+j:02d}" for j in range(4)], [
            f"tok{4*b+j:02d}" for j in range(2)
        ]

    out = []
    for c in range(16):
        own, shared = toks(c)
        partner = c + 8 if c < 8 else c - 8
        p_own, _ = toks(partner)
        # 8 adversarial queries per cluster: majority own-cluster
        # distinctive tokens, minority partner tokens; permuted order;
        # one with a never-seen filler token.
        qs = [
            f"{own[0]} {own[1]} {p_own[0]} {own[2]}",
            f"{own[3]} {p_own[1]} {own[0]} {own[1]}",
            f"{shared[0]} {own[2]} {own[3]} {p_own[2]}",
            f"{own[1]} {own[2]} {shared[1]} {p_own[3]}",
            f"{own[0]} {own[3]} {own[2]} {p_own[0]} {shared[0]}",
            f"{p_own[1]} {own[1]} {own[0]} {own[3]} {shared[1]}",
            f"{own[2]} {own[0]} tok99 {own[1]}",
            f"{own[3]} {own[2]} {own[1]} tok98 {p_own[2]}",
        ]
        out += [[q, c] for q in qs]
    for t, _ in out:
        assert t not in train_texts, t
    seen = {t for t, _ in orig}
    out = [p for p in out if p[0] not in seen]
    return orig + out


#: 16 natural-prose clusters for the r10 encoder axis (r9 verdict #3 /
#: advisor: the synthetic-token mixed-cluster family re-saturated at
#: 1.0000, so the gate lost discriminative power). Every content word
#: is ordinary English and NONE appears in the synthetic tok00..tok63
#: encoder training corpus — the axis measures UNSEEN-cluster,
#: unseen-VOCABULARY generalization, the capability NLP_EVAL.md names
#: as the remaining headroom. Word pools are pairwise disjoint so the
#: cluster signal is the topical vocabulary, like real text.
_NL_CLUSTERS = [
    ("astronomy", ["telescope", "galaxy", "nebula", "orbit", "comet",
                   "supernova", "eclipse", "asteroid", "observatory",
                   "constellation"]),
    ("cooking", ["simmer", "saucepan", "garlic", "marinade", "whisk",
                 "oven", "broth", "seasoning", "skillet", "casserole"]),
    ("football", ["midfielder", "goalkeeper", "penalty", "offside",
                  "striker", "fixture", "stadium", "referee", "corner",
                  "defender"]),
    ("gardening", ["seedling", "compost", "perennial", "mulch",
                   "trellis", "greenhouse", "pruning", "bloom",
                   "flowerbed", "weeding"]),
    ("banking", ["deposit", "mortgage", "ledger", "overdraft",
                 "statement", "savings", "teller", "loan", "interest",
                 "cheque"]),
    ("medicine", ["diagnosis", "symptom", "prescription", "dosage",
                  "clinic", "vaccine", "therapy", "infection",
                  "surgeon", "ward"]),
    ("hiking", ["trailhead", "summit", "ridge", "backpack",
                "switchback", "campsite", "elevation", "scramble",
                "valley", "cairn"]),
    ("programming", ["compiler", "refactor", "debugger", "syntax",
                     "runtime", "repository", "iterator", "exception",
                     "variable", "bytecode"]),
    ("music", ["melody", "chord", "tempo", "rehearsal", "orchestra",
               "harmony", "verse", "percussion", "conductor",
               "soprano"]),
    ("weather", ["forecast", "drizzle", "humidity", "thunderstorm",
                 "barometer", "overcast", "gust", "frost", "heatwave",
                 "visibility"]),
    ("automotive", ["transmission", "carburetor", "odometer", "brake",
                    "chassis", "ignition", "exhaust", "dashboard",
                    "alternator", "windscreen"]),
    ("fishing", ["angler", "bait", "reel", "riverbank", "lure",
                 "trout", "hook", "waders", "floater", "netting"]),
    ("law", ["plaintiff", "verdict", "subpoena", "testimony",
             "barrister", "statute", "appeal", "courtroom", "clause",
             "acquittal"]),
    ("fashion", ["runway", "tailoring", "fabric", "hemline", "couture",
                 "wardrobe", "stitching", "accessory", "mannequin",
                 "lookbook"]),
    ("chemistry", ["beaker", "titration", "catalyst", "solvent",
                   "molecule", "reagent", "distillation", "compound",
                   "precipitate", "electrolyte"]),
    ("aviation", ["cockpit", "fuselage", "altitude", "turbulence",
                  "winglet", "aileron", "taxiway", "throttle",
                  "airspeed", "hangar"]),
]

#: Shared grammatical templates (filler words common across clusters,
#: like real text); cluster identity rides ONLY on the content words.
#: Five content slots per sentence — topical text reuses its
#: vocabulary densely; with fewer slots the shared filler/template
#: structure drowns the cluster signal for EVERY embedding and the
#: axis measures noise, not generalization (measured: 3-slot
#: templates put even the training-free hash baseline at 0.28).
_NL_TEMPLATES = [
    "the {a} sat by the {b} while the {c} and the {d} hid the {e}",
    "a {a} needs its {b} its {c} and a clean {d} for the {e}",
    "we took the {a} from the {b} to the {c} past a {d} and the {e}",
    "one {a} one {b} and one {c} lay under the {d} near the {e}",
]


def gen_encoder_nl():
    """12 natural-prose DOCUMENTS per cluster (192 total): each row is
    THREE sentences — consecutive templates with rotating word slices
    — so every document carries a near-identical filler/template
    profile and cosine differences ride on the content vocabulary
    alone. (Single-sentence rows alias by TEMPLATE: with 4 shared
    templates the 8-word filler overlap of same-template cross-cluster
    pairs beats the 2-3-word content overlap of same-cluster pairs,
    and even the training-free hash baseline drops to 0.28 — an eval
    measuring sentence-frame noise, not topic generalization. Real
    retrieval units are multi-sentence documents anyway.)
    Deterministic, no RNG. tools/nlp_eval.py splits per cluster into
    8 database rows + 4 queries (every third row); the metric is
    cosine 1-NN cluster match — the standard retrieval protocol,
    with the WHOLE axis out-of-distribution for the shipped encoder
    (training saw only synthetic tok00..tok63)."""
    pools = [p for _, p in _NL_CLUSTERS]
    flat = [w for p in pools for w in p]
    assert len(flat) == len(set(flat)), "cluster word pools must be disjoint"
    out = []
    for c, pool in enumerate(pools):
        for i in range(12):
            parts = []
            for s in range(3):
                w = {
                    k: pool[(i + 2 * s + off) % 10]
                    for k, off in zip("abcde", (0, 1, 2, 5, 7))
                }
                parts.append(_NL_TEMPLATES[(i + s) % 4].format(**w))
            out.append([" ".join(parts), c])
    texts = [t for t, _ in out]
    assert len(texts) == len(set(texts)), "generated rows must be unique"
    return out


# --- keywords --------------------------------------------------------------

def gen_keywords():
    orig = _load("keyword_eval.json")
    corpus_vocab = {
        tok for t, _ in _load("topic_corpus.json") for tok in t.lower().split()
    }
    # gold terms: rare OOV; distractors: ALSO OOV, so the corpus-IDF
    # model sees identical default idf for both — only docs where the
    # golds' term frequency wins are separable. Fillers: common
    # in-vocab words (low idf) repeated heavily.
    gold_bank = [
        ["quasar", "pulsar", "nebula", "magnetar", "blazar"],
        ["fjord", "tundra", "steppe", "atoll", "caldera"],
        ["sonnet", "villanelle", "sestina", "haiku", "ghazal"],
        ["gavotte", "mazurka", "polonaise", "bolero", "tarantella"],
        ["isotope", "hadron", "lepton", "boson", "quark"],
        ["obsidian", "basalt", "gneiss", "schist", "marble"],
        ["cumulus", "cirrus", "stratus", "nimbus", "contrail"],
        ["saffron", "cardamom", "turmeric", "sumac", "zaatar"],
    ]
    distract_bank = [
        ["meteor", "comet"],
        ["lagoon", "dune"],
        ["ballad", "ode"],
        ["waltz", "tango"],
        ["photon", "gluon"],
        ["quartz", "shale"],
        ["drizzle", "squall"],
        ["clove", "anise"],
    ]
    fillers = ["query", "filter", "join", "scan", "state", "commit", "files", "window"]
    out = []
    for i, (golds, distractors) in enumerate(zip(gold_bank, distract_bank)):
        for g in golds:
            assert g not in corpus_vocab, g
        for d in distractors:
            assert d not in corpus_vocab, d
        f1, f2, f3 = (
            fillers[i % 8],
            fillers[(i + 1) % 8],
            fillers[(i + 2) % 8],
        )
        filler = f"{f1} " * 4 + f"{f2} " * 4 + f"{f3} " * 3
        # (a) clean: golds x2, fillers heavy — IDF separates, TF fails
        out.append(
            {
                "text": (filler + " ".join(w for g in golds for w in (g, g))).strip(),
                "gold": golds,
            }
        )
        # (b) adversarial: two OOV distractors at tf 3 >= golds' tf 2 —
        # same default idf, higher tf: the model MUST rank them above
        # two golds (honest headroom for a corpus-IDF artifact).
        body = " ".join(w for g in golds for w in (g, g))
        dbody = " ".join(w for d in distractors for w in (d, d, d))
        out.append({"text": (filler + body + " " + dbody).strip(), "gold": golds})
        # (c) near-tie: distractors at tf 2 == golds' tf 2 — rank is
        # alphabetical among equals; partial credit only.
        dbody2 = " ".join(w for d in distractors for w in (d, d))
        out.append({"text": (filler + body + " " + dbody2).strip(), "gold": golds})
        # (d) golds at uneven tf (3,3,2,2,1): the tf-1 gold usually
        # loses the top-5 cut to nothing at all in clean docs, but
        # fillers never outrank it (idf floor does its job).
        reps = [3, 3, 2, 2, 1]
        ubody = " ".join(w for g, r in zip(golds, reps) for w in [g] * r)
        out.append({"text": (filler * 2 + ubody).strip(), "gold": golds})
    seen = {d["text"] for d in orig}
    out = [d for d in out if d["text"] not in seen]
    return orig + out


def main():
    s = gen_sentiment()
    t = gen_topic()
    e = gen_encoder()
    enl = gen_encoder_nl()
    k = gen_keywords()
    _dump("sentiment_eval.json", s)
    _dump("topic_eval.json", t)
    _dump("encoder_eval.json", e)
    _dump("encoder_nl_eval.json", enl)
    _dump("keyword_eval.json", k)
    print(
        f"sentiment {len(s)}  topic {len(t)}  encoder {len(e)}  "
        f"encoder_nl {len(enl)}  keyword {len(k)}"
    )


if __name__ == "__main__":
    main()
