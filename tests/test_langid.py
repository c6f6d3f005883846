"""Language-ID heuristic: hand-labelled sentences, edge cases, the
DuckDB twin differential, and the stays-JVM-side plan assertion."""

import duckdb
import pytest
from pyspark.sql import functions as F

from helix_html2md_spark.functions.langid import (
    lang_id,
    lang_stats,
    script_counts,
    sql_lang_id,
)

SENTENCES = [
    # Latin-script languages — ordinary prose with function words
    ("the quick brown fox jumped over the lazy dog and it was fine", "en"),
    ("this is a test of the system that was built for the pipeline", "en"),
    ("der Hund lief nicht mit der Katze und das Wetter ist schön", "de"),
    ("ich habe ein Buch mit der Geschichte auf dem Tisch gelesen", "de"),
    ("le chat est dans la maison des voisins pour la nuit", "fr"),
    ("les enfants ne sont pas dans le jardin qui est grand", "fr"),
    ("el perro corre por el parque con los niños pero sin una pelota",
     "es"),
    ("las casas del pueblo son blancas para el verano como siempre", "es"),
    ("il gatto di casa dorme sono sicuro che anche il cane dorme", "it"),
    ("la macchina della nonna è anche la macchina per il mercato", "it"),
    ("o menino está em casa com um livro e não quer sair mais", "pt"),
    ("as ruas são largas como os rios e um dia vou voltar", "pt"),
    ("de kat zit niet op het dak van een huis met de buren", "nl"),
    ("dat is ook een goed idee voor het feest met zijn vrienden", "nl"),
    # script-majority languages
    ("这是一个中文句子用来测试语言识别", "zh"),
    ("これは日本語のテスト文です", "ja"),
    ("漢字とかなが混ざった文章です", "ja"),
    ("이것은 한국어 테스트 문장입니다", "ko"),
    ("это предложение написано на русском языке", "ru"),
    ("هذه جملة باللغة العربية للاختبار", "ar"),
    ("यह हिंदी में एक परीक्षण वाक्य है", "hi"),
    ("αυτή είναι μια πρόταση στα ελληνικά", "el"),
    # undecidable
    ("12345 67890 !!! ???", "und"),
    ("", "und"),
    ("zzz qqq xxx vvv", "und"),  # latin letters, zero stopword hits
]


@pytest.fixture(scope="module")
def sdf(spark):
    rows = [(i, t) for i, (t, _) in enumerate(SENTENCES)]
    rows.append((len(rows), None))  # null text
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_hand_labels(sdf):
    got = {
        r["doc_id"]: r["lang_pred"]
        for r in lang_stats(sdf).collect()
    }
    for i, (text, want) in enumerate(SENTENCES):
        assert got[i] == want, f"{text!r}: want {want}, got {got[i]}"
    assert got[len(SENTENCES)] == "und"  # null text


def test_script_counts(spark):
    df = spark.createDataFrame(
        [(1, "ab 中文 かな 한글")], "doc_id bigint, text string"
    )
    row = df.select(script_counts(F.col("text")).alias("s")).first()["s"]
    assert row["latin"] == 2
    assert row["han"] == 2
    assert row["kana"] == 2
    assert row["hangul"] == 2
    assert row["cyrillic"] == 0


def test_tie_breaks_alphabetical(spark):
    # "como" is in BOTH the es and pt marker lists -> 1 hit each, and
    # the deterministic tie-break picks the alphabetically first code.
    df = spark.createDataFrame([(1, "como xyz")], "doc_id bigint, text string")
    assert df.select(lang_id(F.col("text")).alias("l")).first()["l"] == "es"


def test_duckdb_differential(spark, sdf):
    """The generated SQL twin must agree row-for-row — on the hand corpus
    AND on the synthetic documents table (whose text is English-ish token
    soup: the interesting property there is exact cross-engine equality,
    not label recovery)."""
    con = duckdb.connect()
    # hand corpus
    pdf = sdf.toPandas()
    con.register("hand", pdf)
    want = dict(
        con.sql(
            f"SELECT doc_id, {sql_lang_id('text')} FROM hand"
        ).fetchall()
    )
    got = {r["doc_id"]: r["lang_pred"] for r in lang_stats(sdf).collect()}
    assert got == want
    # synthetic documents at sf0.001
    path = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(path)
    got2 = {
        r["doc_id"]: r["lang_pred"] for r in lang_stats(docs).collect()
    }
    want2 = dict(
        con.sql(
            f"SELECT doc_id, {sql_lang_id('text')} FROM '{path}'"
        ).fetchall()
    )
    assert got2 == want2
    # the soup is English-stopword-bearing ("the") — sanity that the
    # vote mostly lands on en (docs whose sample misses every marker
    # word legitimately fall to 'und')
    langs = list(got2.values())
    assert set(langs) <= {"en", "und"}
    assert langs.count("en") > len(langs) * 0.5


def test_plan_stays_jvm_side(spark, sdf):
    plan = lang_stats(sdf)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # narrow map stage, shuffle-free
    # the staged columns must keep each regex pass at ONE occurrence:
    # 8 script-range counts + 1 latin word-cleaner = 9 (the inlined
    # lang_id form replicates them across every CASE branch — ~70)
    assert plan.count("regexp_replace") == 9, plan.count("regexp_replace")


def test_filter_language(spark, sdf):
    from helix_html2md_spark.functions.langid import filter_language

    kept = {
        r["doc_id"] for r in filter_language(sdf, keep=("de",)).collect()
    }
    want = {i for i, (_, lang) in enumerate(SENTENCES) if lang == "de"}
    assert kept == want
    # 'und' is opt-in: NULL/letterless rows drop unless named
    both = {
        r["doc_id"]
        for r in filter_language(sdf, keep=("de", "und")).collect()
    }
    assert both > kept
    import pytest

    with pytest.raises(ValueError, match="keep"):
        filter_language(sdf, keep=())
