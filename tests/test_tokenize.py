"""Tokenizer + Porter2 goldens.

The 'hello worlds' pairs mirror the reference's tokenizer contract
(``tests/test_tokenize.py:10-11``: no-stem -> ['hello','worlds'],
porter2 -> ['hello','world']). The Porter2 pair list is drawn from the
published Snowball English sample vocabulary.
"""

from hypothesis import given, strategies as st

from pyterrier_pisa_spark.functions.porter2 import stem
from pyterrier_pisa_spark.functions.tokenizer import tokenize_text, tokenize_queries

PORTER2_GOLDENS = {
    # reference tokenizer golden
    "worlds": "world",
    "hello": "hello",
    # snowball english sample pairs (public algorithm description examples)
    "consign": "consign",
    "consigned": "consign",
    "consigning": "consign",
    "consignment": "consign",
    "consist": "consist",
    "consisted": "consist",
    "consistency": "consist",
    "consistent": "consist",
    "consistently": "consist",
    "consisting": "consist",
    "consists": "consist",
    "consolation": "consol",
    "knack": "knack",
    "knackeries": "knackeri",
    "knag": "knag",
    "knave": "knave",
    "knaves": "knave",
    "knavish": "knavish",
    "kneaded": "knead",
    "kneading": "knead",
    "knee": "knee",
    "kneel": "kneel",
    "kneeled": "kneel",
    "kneeling": "kneel",
    "kneels": "kneel",
    "knees": "knee",
    "knell": "knell",
    "knelt": "knelt",
    "knew": "knew",
    "knick": "knick",
    "knif": "knif",
    "knife": "knife",
    "knight": "knight",
    "knightly": "knight",
    "knights": "knight",
    "knit": "knit",
    "knits": "knit",
    "knitted": "knit",
    "knitting": "knit",
    "knives": "knive",
    "knob": "knob",
    "knobs": "knob",
    "knock": "knock",
    "knocked": "knock",
    "knocker": "knocker",
    "knockers": "knocker",
    "knocking": "knock",
    "knocks": "knock",
    "knopp": "knopp",
    "knot": "knot",
    "knots": "knot",
    # step-specific checks from the algorithm description
    "caresses": "caress",
    "ties": "tie",
    "cries": "cri",
    "gas": "gas",
    "this": "this",
    "gaps": "gap",
    "kiwis": "kiwi",
    "agreed": "agre",
    "feed": "feed",
    "plastered": "plaster",
    "bled": "bled",
    "motoring": "motor",
    "sing": "sing",
    "conflated": "conflat",
    "troubled": "troubl",
    "sized": "size",
    "hopping": "hop",
    "tanned": "tan",
    "falling": "fall",
    "hissing": "hiss",
    "fizzed": "fizz",
    "failing": "fail",
    "filing": "file",
    "cry": "cri",
    "by": "by",
    "say": "say",
    "relational": "relat",
    "conditional": "condit",
    "rational": "ration",
    "valenci": "valenc",
    "hesitanci": "hesit",
    "digitizer": "digit",
    "conformabli": "conform",
    "radicalli": "radic",
    "differentli": "differ",
    "vileli": "vile",
    "analogousli": "analog",
    "vietnamization": "vietnam",
    "predication": "predic",
    "operator": "oper",
    "feudalism": "feudal",
    "decisiveness": "decis",
    "hopefulness": "hope",
    "callousness": "callous",
    "formaliti": "formal",
    "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "triplicate": "triplic",
    "formative": "format",  # 'ative' not in R2; step-4 'ive' deletes (porter1 gave 'form')
    "formalize": "formal",
    "electriciti": "electr",
    "electrical": "electr",
    "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv",
    "allowance": "allow",
    "inference": "infer",
    "airliner": "airlin",
    "gyroscopic": "gyroscop",
    "adjustable": "adjust",
    "defensible": "defens",
    "irritant": "irrit",
    "replacement": "replac",
    "adjustment": "adjust",
    "dependent": "depend",
    "adoption": "adopt",
    # R1-exception words: 'commun' prefix forces R1='ism', R2 past end -> no strip
    "communism": "communism",
    "generous": "generous",
    "generate": "generat",
    "activate": "activ",
    "angulariti": "angular",
    "homologous": "homolog",
    "effective": "effect",
    "bowdlerize": "bowdler",
    "probate": "probat",
    "rate": "rate",
    "cease": "ceas",
    "controll": "control",
    "roll": "roll",
    # exceptional forms
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "news": "news",
    "sky": "sky",
    "early": "earli",
    "only": "onli",
    "proceed": "proceed",
    "exceed": "exceed",
    "succeed": "succeed",
    "inning": "inning",
    "outing": "outing",
    "canning": "canning",
}


def test_porter2_goldens():
    errors = {w: (stem(w), want) for w, want in PORTER2_GOLDENS.items() if stem(w) != want}
    assert not errors, f"{len(errors)} porter2 mismatches: {errors}"


def test_tokenize_reference_goldens():
    # reference tests/test_tokenize.py:10-11
    assert tokenize_text("hello worlds", stemmer="none") == ["hello", "worlds"]
    assert tokenize_text("hello worlds", stemmer="porter2") == ["hello", "world"]
    # punctuation dropped (reference README.md:125-127)
    assert tokenize_text("Hello, worlds!", stemmer="none") == ["hello", "worlds"]
    # newlines and digits
    assert tokenize_text("a1\nb2\rc3", stemmer="none") == ["a1", "b2", "c3"]
    assert tokenize_text(None) == []
    assert tokenize_text("") == []


def test_tokenize_queries_stop_and_weights():
    rows = tokenize_queries(
        [("q1", "the cat and the hat"), ("q2", "dogs dogs")],
        stemmer="none",
        stopwords=frozenset(["the", "and"]),
    )
    d = {}
    for qid, term, w in rows:
        d[(qid, term)] = w
    assert d == {("q1", "cat"): 1.0, ("q1", "hat"): 1.0, ("q2", "dogs"): 2.0}


@given(st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=20))
def test_porter2_total_and_idempotent_shape(word):
    s = stem(word)
    assert isinstance(s, str)
    assert s == s.lower()
    assert len(s) <= len(word) + 1  # porter2 may add back an 'e'


def test_terrier_stopword_list_vendored():
    """The reference's DEFAULT stop list (T7): 733 words from
    org.terrier.terms.Stopwords, vendored verbatim (reference
    stopwords.py:1-6, default wiring __init__.py:120)."""
    from pyterrier_pisa_spark.functions.stopwords import (
        DEFAULT_STOPWORDS, TERRIER, get_stopwords)

    assert len(TERRIER) == 733
    # spot membership: common words + Terrier's idiosyncratic entries
    for w in ["the", "a", "and", "get", "yourselves", "zillion", "abaft",
              "vis-a-vis", "anywhere", "whereas"]:
        assert w in TERRIER, w
    for w in ["cat", "spark", "query", "return"]:
        assert w not in TERRIER, w
    assert DEFAULT_STOPWORDS == "terrier"
    assert get_stopwords("terrier") is TERRIER


def test_default_stopwords_is_terrier_in_query_path():
    from pyterrier_pisa_spark.functions.stopwords import get_stopwords
    from pyterrier_pisa_spark.functions.tokenizer import tokenize_queries

    rows = tokenize_queries([("q1", "the cat gets aboard")], stemmer="none",
                            stopwords=get_stopwords("terrier"))
    assert {t for _, t, _ in rows} == {"cat", "aboard"}  # the/gets dropped


def test_stopword_filter_applies_to_stemmed_terms():
    """Reference semantics (_pisathon.cpp:501): stopwords are stemmed by the
    same TermProcessor, so the check is stem(query term) in stem(stop list).
    'yourselves' must be filtered under porter2 even though only its stem
    matches the stemmed list."""
    from pyterrier_pisa_spark.operators.retrieve import query_terms_df
    from pyterrier_pisa_spark.functions.porter2 import stem

    assert stem("yourselves") != "yourselves"  # the interesting case
    import pyspark.sql as _sql
    spark = _sql.SparkSession.getActiveSession() or _sql.SparkSession.builder \
        .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    qdf = query_terms_df(spark, [("q1", "yourselves running cat")],
                         stemmer="porter2", stopwords="terrier")
    terms = {r["term"] for r in qdf.collect()}
    assert "run" in terms and "cat" in terms
    assert stem("yourselves") not in terms  # stemmed stopword dropped
