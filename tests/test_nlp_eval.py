"""Held-out quality eval for the four shipped NLP artifacts (r6
verdict #4): the committed NLP_EVAL.md table must be exactly what
tools/nlp_eval.py recomputes, and every model must beat its
zero-parameter heuristic baseline on the held-out fixtures."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import nlp_eval  # noqa: E402


def test_models_beat_baselines_on_held_out():
    # Floors are the HONEST r9 numbers on the grown adversarial eval
    # sets (r8 verdict #3 — the r8 fixtures saturated at 1.0000 and
    # measured eval-vocab coverage, not generalization; see
    # tools/gen_eval_fixtures.py and NLP_EVAL.md's reading note).
    # Measured r9 (sentiment v2: negation-scope signed featurizer +
    # opinion lexicon; topic v2: poly-hash featurizer + corpus grown
    # 66->186; keyword ties break by first occurrence; encoder v2:
    # uni+bigram v3 featurizer + mixture-augmented corpus 192->320;
    # frozen evals): sentiment 0.7324/0.7298, topic 0.8917, encoder
    # 1.0000 (carrier validation 0.9922 — see NLP_EVAL.md), keyword
    # 0.7400 — floors sit just below so a regression trips while
    # headroom stays visible.
    s, t, e, enl, k = nlp_eval.compute_all()
    # sentiment: must beat the fixed lexicon on both metrics; macro-F1
    # is the decisive margin (negation/sarcasm cases break both, but
    # the lexicon collapses to near-one-class predictions)
    assert s["model"]["acc"] > s["baseline"]["acc"]
    assert s["model"]["f1"] >= s["baseline"]["f1"] + 0.2
    assert s["model"]["acc"] >= 0.72
    # topic: above the rule-density heuristic
    assert t["model"]["acc"] >= t["baseline"]["acc"] + 0.1
    assert t["model"]["acc"] >= 0.87
    # encoder: above the hash-projection baseline on the
    # mixed-cluster queries
    assert e["model"]["acc"] >= e["baseline"]["acc"] + 0.15
    assert e["model"]["acc"] >= 0.99
    # encoder, natural-prose UNSEEN clusters (r10 axis): EVAL-ONLY —
    # training is deliberately not grown toward it, so the row keeps
    # measuring vocabulary-generalization headroom. Since r11 the
    # 'model' arm is the SHIPPED coverage-gated default (r10 verdict
    # #6): every eval row sits below the measured coverage threshold
    # (max 0.235 < 1/4), so the default serves the hash embedding and
    # must score >= the baseline (equality by construction; a dip
    # below means the gate mis-routed a row). The RAW probe number is
    # kept as ungated_acc and only floors gross regression — the
    # documented inversion (0.4688 vs 0.9062) is the honest ceiling
    # of the synthetic-corpus artifact. The baseline floor matters
    # too: it proves the axis is SOLVABLE by a vocabulary-driven
    # embedding (an eval no embedding can pass measures noise, which
    # is how the first single-sentence cut failed — see
    # gen_eval_fixtures.gen_encoder_nl).
    assert enl["model"]["acc"] >= enl["baseline"]["acc"]
    assert enl["ungated_acc"] >= 0.40
    assert enl["baseline"]["acc"] >= 0.85
    # keywords: IDF weighting must beat plain TF
    assert k["model"]["f1"] >= k["baseline"]["f1"] + 0.2
    assert k["model"]["f1"] >= 0.72


def test_committed_eval_table_reproduces():
    committed = open(
        os.path.join(os.path.dirname(__file__), "..", "NLP_EVAL.md")
    ).read()
    assert nlp_eval.render(nlp_eval.compute_all()) == committed


def test_eval_fixtures_disjoint_from_training():
    fix = os.path.join(os.path.dirname(__file__), "fixtures")

    def texts(name, key=None):
        with open(os.path.join(fix, name)) as fh:
            data = json.load(fh)
        if key:
            return {d[key] for d in data}
        return {t for t, _ in data}

    assert not texts("sentiment_eval.json") & texts("sentiment_corpus.json")
    # The FULL v2 sentiment training set (corpus + opinion-lexicon
    # single-word rows + balanced-template rows) must stay text-
    # disjoint from the frozen eval — including the generated
    # template sentences, so a template collision with an eval
    # sentence cannot slip in unnoticed.
    from dss_nlp_ingestion_spark.functions import nlp as N

    with open(os.path.join(fix, "sentiment_corpus.json")) as fh:
        corpus = json.load(fh)
    with open(os.path.join(fix, "opinion_lexicon.json")) as fh:
        lexicon = json.load(fh)
    train_texts, _, _ = N.sentiment_training_set(corpus, lexicon)
    assert not texts("sentiment_eval.json") & set(train_texts)
    assert not texts("topic_eval.json") & texts("topic_corpus.json")
    assert not texts("encoder_eval.json") & texts("encoder_corpus.json")
    # The r10 natural-prose axis: text-disjoint from training like
    # every other eval, and — stronger — its content VOCABULARY is
    # fully disjoint from the synthetic training tokens (that full-OOV
    # property is what the axis measures; a training row slipping
    # into the tok-vocabulary would silently weaken it).
    assert not texts("encoder_nl_eval.json") & texts("encoder_corpus.json")
    train_vocab = {
        tok for t in texts("encoder_corpus.json") for tok in t.split()
    }
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    import gen_eval_fixtures as gef

    nl_content = {w for _, pool in gef._NL_CLUSTERS for w in pool}
    assert not nl_content & train_vocab
    # keyword IDF trains on the topic corpus TEXTS; held-out means
    # (a) no eval doc equals a training text and (b) the GOLD terms
    # are out-of-vocabulary rare terms (they score via default_q) —
    # if a gold leaks into the IDF vocab the F1 claim silently
    # becomes in-corpus evaluation (r7 review finding).
    with open(os.path.join(fix, "keyword_eval.json")) as fh:
        kdocs = json.load(fh)
    corpus_texts = texts("topic_corpus.json")
    corpus_vocab = {
        tok for t in corpus_texts for tok in t.lower().split()
    }
    for d in kdocs:
        assert d["text"] not in corpus_texts
        assert not set(g.lower() for g in d["gold"]) & corpus_vocab


def test_encoder_corpus_augmentation_provenance():
    """The grown encoder corpus must be exactly: the original 192
    rows as the verbatim prefix + the deterministic mixture rows from
    tools/gen_encoder_corpus.py (nothing hand-slipped in), and the
    carrier validation used for model selection must be disjoint from
    BOTH the eval fixture and the training corpus."""
    import gen_encoder_corpus as g

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    with open(os.path.join(fix, "encoder_corpus.json")) as fh:
        corpus = json.load(fh)
    mix = g.mixture_rows()
    assert corpus[-len(mix):] == mix
    assert len(corpus) == 192 + len(mix)
    with open(os.path.join(fix, "encoder_eval.json")) as fh:
        eval_texts = {t for t, _ in json.load(fh)}
    corpus_texts = {t for t, _ in corpus}
    val = g.carrier_validation()
    assert not {t for t, _ in val} & eval_texts
    assert not {t for t, _ in val} & corpus_texts
