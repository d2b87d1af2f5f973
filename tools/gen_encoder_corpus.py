"""Grow the encoder TRAINING corpus with deterministic mixed-cluster rows.

The committed mixed-cluster encoder eval (tools/gen_eval_fixtures.py)
exposed that the class-probe encoder had never seen a mixed DOCUMENT:
queries with a 3:1 own:partner token majority retrieved partner-cluster
neighbors. This tool appends 8 deterministic majority-own mixture rows
per cluster (3 own + 1 partner, and 3 own + 1 partner + 1 shared) to
``tests/fixtures/encoder_corpus.json`` — coverage engineering on
TRAINING materials, stated plainly, mirroring the sentiment-lexicon
augmentation discipline:

- the appended texts are asserted disjoint from every eval text;
- the original 192 rows are preserved verbatim as the list prefix;
- model/featurizer selection used a carrier VALIDATION of the same
  mixture family (different permutation slices + different filler
  tokens, also disjoint from the eval) — run with ``--report`` to
  rebuild it and print validation accuracy for the shipped artifact.

Deterministic (no RNG). Re-run: ``python tools/gen_encoder_corpus.py``
then retrain via ``python tools/nlp_eval.py --write`` provenance flow
(tests/test_functions_unit.py pins artifact == retrain-on-fixture).
"""

from __future__ import annotations

import json
import os
import sys

FIX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
)


def _load(name):
    with open(os.path.join(FIX, name)) as fh:
        return json.load(fh)


def _toks(c):
    """Cluster c's (own, shared) token lists — the corpus's committed
    structure: clusters c and c+8 overlap (lo range 4c..4c+3, hi range
    32+4c..32+4c+3)."""
    if c < 8:
        return [f"tok{4*c+j:02d}" for j in range(4)], [
            f"tok{32+4*c+j:02d}" for j in range(2)
        ]
    b = c - 8
    return [f"tok{32+4*b+j:02d}" for j in range(4)], [
        f"tok{4*b+j:02d}" for j in range(2)
    ]


def mixture_rows():
    """The 128 deterministic majority-own mixture rows (8 per cluster)."""
    out = []
    for c in range(16):
        own, shared = _toks(c)
        partner = c + 8 if c < 8 else c - 8
        p_own, _ = _toks(partner)
        rows = [
            f"{own[0]} {own[1]} {own[2]} {p_own[0]}",
            f"{own[1]} {own[2]} {own[3]} {p_own[1]}",
            f"{own[2]} {own[3]} {own[0]} {p_own[2]}",
            f"{own[3]} {own[0]} {own[1]} {p_own[3]}",
            f"{own[0]} {own[2]} {own[1]} {p_own[1]} {shared[0]}",
            f"{own[1]} {own[3]} {own[2]} {p_own[2]} {shared[1]}",
            f"{own[0]} {own[3]} {own[1]} {p_own[0]} {shared[1]}",
            f"{own[2]} {own[1]} {own[3]} {p_own[3]} {shared[0]}",
        ]
        out += [[q, c] for q in rows]
    return out


def carrier_validation():
    """The model-selection validation: same mixture family, DIFFERENT
    permutation slices and filler tokens (tok96/tok97, not the eval's
    tok98/tok99), disjoint from both the eval and the training rows."""
    out = []
    for c in range(16):
        own, shared = _toks(c)
        partner = c + 8 if c < 8 else c - 8
        p_own, _ = _toks(partner)
        out += [
            [q, c]
            for q in [
                f"{own[2]} {own[3]} {p_own[3]} {own[0]}",
                f"{own[1]} {p_own[2]} {own[3]} {own[2]}",
                f"{shared[1]} {own[0]} {own[1]} {p_own[0]}",
                f"{own[3]} {own[0]} {shared[0]} {p_own[1]}",
                f"{own[1]} {own[2]} {own[0]} {p_own[3]} {shared[1]}",
                f"{p_own[0]} {own[2]} {own[3]} {own[1]} {shared[0]}",
                f"{own[0]} {own[1]} tok97 {own[3]}",
                f"{own[2]} {own[3]} {own[0]} tok96 {p_own[1]}",
            ]
        ]
    return out


def main(argv):
    eval_texts = {t for t, _ in _load("encoder_eval.json")}
    corpus = _load("encoder_corpus.json")
    have = {t for t, _ in corpus}
    added = [
        p for p in mixture_rows() if p[0] not in have and p[0] not in eval_texts
    ]
    for t, _ in mixture_rows():
        assert t not in eval_texts, f"augmentation row collides with eval: {t}"

    if "--report" in argv:
        import numpy as np

        sys.path.insert(0, os.path.dirname(FIX.rstrip("/")).rsplit("/tests", 1)[0])
        from dss_nlp_ingestion_spark.functions import nlp as N

        model = N.load_encoder_artifact(N.DEFAULT_ENCODER_ARTIFACT)
        val = carrier_validation()
        db = corpus
        dbv = np.stack(
            [N.encode_text_int64(model, t).astype("float64") for t, _ in db]
        )
        qv = np.stack(
            [N.encode_text_int64(model, t).astype("float64") for t, _ in val]
        )

        def norm(m):
            n = np.linalg.norm(m, axis=1, keepdims=True)
            return m / np.where(n == 0, 1, n)

        nn = (norm(qv) @ norm(dbv).T).argmax(axis=1)
        dy = [l for _, l in db]
        acc = float(np.mean([dy[i] == y for i, (_, y) in zip(nn, val)]))
        print(f"carrier validation 1-NN acc: {acc:.4f} (n={len(val)})")
        return

    if not added:
        print("corpus already contains every mixture row; nothing to do")
        return
    corpus += added
    with open(os.path.join(FIX, "encoder_corpus.json"), "w") as fh:
        json.dump(corpus, fh, indent=1, ensure_ascii=False)
        fh.write("\n")
    print(f"appended {len(added)} mixture rows -> {len(corpus)} total")


if __name__ == "__main__":
    main(sys.argv[1:])
