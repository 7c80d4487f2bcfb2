"""Porter stemmer: the published algorithm's own example vocabulary
(Porter 1980 §"The algorithm" examples) + the metrics normalize hook."""

import pytest

from dlkp_spark.analysis.stem import porter_stem, stem_normalize
from dlkp_spark.metrics import compute_f1s

# examples straight from the published algorithm description
GOLDEN = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "caress": "caress", "cats": "cat",
    # step 1b
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing",
    # 1b cleanup
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "homologou": "homolog", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas", "controll": "control",
    "roll": "roll",
}


@pytest.mark.parametrize("word,want", sorted(GOLDEN.items()))
def test_porter_golden(word, want):
    assert porter_stem(word) == want


def test_short_words_unchanged():
    for w in ("a", "is", "be", "on"):
        assert porter_stem(w) == w


def test_stem_normalize_phrase():
    assert stem_normalize("Neural Keyphrase Extraction") == "neural keyphras extract"


def test_compute_f1s_with_stemming_matches_reference_semantics():
    """Reference metrics.py:80-89: predictions and gold are stemmed before
    set comparison — morphological variants must now match."""
    pred = ["keyphrase extractions", "distributed queries"]
    gold = ["keyphrase extraction", "something else"]
    no_stem = compute_f1s(pred, gold)
    stemmed = compute_f1s(pred, gold, normalize=stem_normalize)
    assert no_stem["P@m"] == 0.0
    assert stemmed["P@m"] == 0.5
    assert stemmed["R@m"] == 0.5
