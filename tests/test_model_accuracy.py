"""Measured accuracy contract for the langid cascade + perplexity LM
(round 8, VERDICT r7 #2 — the test_ivf recall-contract precedent
applied to the last model slots). The numbers live in
BENCH/BASELINE.md; these floors sit just under the measured values so
a regression in the rules, the hashed n-gram model, the seed corpus,
or the trigram LM trips here before the driver gate.

Held-out corpus: fixtures/langid_holdout.py (authored disjoint from
SEED_CORPUS — natural rows per language plus boundary rows straddling
the lang.go:237/250/304/311/327 thresholds)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.model_accuracy import run_langid, run_ppl

# the cascade's REAL boundary cost, each miss tied to a reference
# threshold (documented in the holdout fixture):
#   en->ar  english rate diluted under 0.618 -> other-set model (en
#           not in the set, lang.go:327/81)
#   es->en / pt->en  low-accent rows (latinCount <= 5, lang.go:335)
#   ja->zh  kana/han 0.060 under the 0.1 gate (lang.go:311)
#   zh->hi  han_rate 0.279 under the 0.3 gate (lang.go:304)
EXPECTED_BOUNDARY_MISSES = {"en->ar", "es->en", "pt->en", "ja->zh", "zh->hi"}


def test_langid_cascade_accuracy_contract(spark):
    m = run_langid(spark)
    assert m["rows"] >= 55
    # measured r8: accuracy 0.9091, macro recall 0.9172
    assert m["accuracy"] >= 0.85, m
    assert m["macro_recall"] >= 0.85, m
    for lang, s in m["per_lang"].items():
        assert s["recall"] >= 0.70, (lang, s)
        assert s["precision"] >= 0.70, (lang, s)
    # every miss must be a documented threshold-boundary case — a NEW
    # confusion pair means the rules or the model actually regressed
    assert set(m["confusions"]) <= EXPECTED_BOUNDARY_MISSES, m["confusions"]


def test_perplexity_separation_contract(spark):
    m = run_ppl(spark)
    ch = m["char_shuffle"]
    # measured r8: latin 1.0 / 1.568, other 1.0 / 1.43 — the LM fully
    # separates clean text from char-shuffled gibberish where its
    # trigram coverage is dense
    assert ch["latin"]["concordance"] >= 0.95, ch
    assert ch["latin"]["median_ratio"] >= 1.30, ch
    assert ch["other"]["concordance"] >= 0.95, ch
    assert ch["other"]["median_ratio"] >= 1.25, ch
    # CJK is backoff-dominated with the seed LM (measured 0.63/1.07):
    # the floor pins the measured level and the CAP documents that no
    # separation is being claimed there — crossing 0.9 would mean the
    # LM materially changed and BASELINE.md needs re-measuring
    assert 0.50 <= ch["cjk"]["concordance"] <= 0.90, ch
    # word-shuffle is a measured NEGATIVE result (cross-word trigrams
    # too sparse: concordance ~0.56, ratio ~1.0); assert only that it
    # stays a non-claim so nobody quietly starts relying on it
    assert m["word_shuffle_nonidentity"]["median_ratio"] < 1.15, m
