"""Language-ID quality gate: the trigram-profile scorer must actually
identify languages (>90% on held-out sentences), not just match its own
oracle. Sentences here are original and disjoint from the
profile-building corpus in functions/langid.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cultural_heritage_bigdata_project_spark.functions import langid
from cultural_heritage_bigdata_project_spark.operators import text

HELD_OUT: list[tuple[str, str]] = [
    ("en", "she walked along the river and listened to the birds singing in the trees"),
    ("en", "we should meet at the station before the train leaves this evening"),
    ("en", "my brother works in the city but he comes home every weekend"),
    ("en", "the weather was cold and the streets were empty after midnight"),
    ("en", "please bring the letters to the office when you have finished reading them"),
    ("es", "ella camino junto al rio y escucho a los pajaros cantar en los arboles"),
    ("es", "debemos encontrarnos en la estacion antes de que salga el tren esta tarde"),
    ("es", "mi hermano trabaja en la ciudad pero vuelve a casa cada fin de semana"),
    ("es", "el tiempo era frio y las calles estaban vacias despues de medianoche"),
    ("es", "por favor lleva las cartas a la oficina cuando hayas terminado de leerlas"),
    ("de", "sie ging am fluss entlang und horte den vogeln beim singen in den baumen zu"),
    ("de", "wir sollten uns am bahnhof treffen bevor der zug heute abend abfahrt"),
    ("de", "mein bruder arbeitet in der stadt aber er kommt jedes wochenende nach hause"),
    ("de", "das wetter war kalt und die strassen waren leer nach mitternacht"),
    ("de", "bitte bring die briefe ins buro wenn du sie zu ende gelesen hast"),
    ("fr", "elle marchait le long de la riviere et ecoutait les oiseaux chanter dans les arbres"),
    ("fr", "nous devrions nous retrouver a la gare avant que le train parte ce soir"),
    ("fr", "mon frere travaille dans la ville mais il rentre a la maison chaque semaine"),
    ("fr", "le temps etait froid et les rues etaient vides apres minuit"),
    ("fr", "apporte les lettres au bureau quand tu auras fini de les lire"),
]


def test_python_reference_accuracy():
    """The profile itself must separate languages, independent of Spark."""
    correct = 0
    for label, sent in HELD_OUT:
        scores = langid.score_python(sent)
        pred = max(langid.LANGS, key=lambda l: (scores[l], -langid.LANGS.index(l)))
        correct += pred == label
    acc = correct / len(HELD_OUT)
    assert acc > 0.9, f"held-out accuracy {acc}"


def test_spark_operator_accuracy_and_python_parity(spark):
    df = spark.createDataFrame(
        [(i, label, sent) for i, (label, sent) in enumerate(HELD_OUT)],
        "doc_id long, label string, text string",
    )
    out = text.language_id(df).collect()
    assert len(out) == len(HELD_OUT)
    correct = 0
    for r in out:
        label, sent = HELD_OUT[r.doc_id]
        correct += r.lang_pred == label
        ref = langid.score_python(sent)
        for lang in langid.LANGS:
            got = r[f"score_{lang}"]
            assert math.isclose(got, ref[lang], rel_tol=0, abs_tol=0), (
                f"doc {r.doc_id} score_{lang}: spark={got} python={ref[lang]}"
            )
    acc = correct / len(HELD_OUT)
    assert acc > 0.9, f"spark held-out accuracy {acc}"


def test_short_and_empty_text(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "ab"), (2, "xq")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in text.language_id(df).collect()}
    assert len(out) == 3
    for r in out.values():
        assert r.lang_pred == "und"
        for lang in langid.LANGS:
            assert r[f"score_{lang}"] <= 2.0  # tiny strings, bounded scores


def test_charlm_referee_agreement(spark):
    """Spark charlm_quality must reproduce the pure-Python referee's
    (n_trigrams, avg_logprob) exactly — same integer sum, same IEEE
    division pipeline."""
    from cultural_heritage_bigdata_project_spark.functions.langid import (
        charlm_score_python,
    )
    from cultural_heritage_bigdata_project_spark.operators import text as t

    samples = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "zzz qqq xxx vvv kkk jjj"),  # mostly-OOV garbage
        (2, "el rapido zorro marron salta sobre el perro"),
        (3, "ab"),  # shorter than one trigram after padding still has 2
        (4, ""),
    ]
    df = spark.createDataFrame(samples, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_trigrams, r.avg_logprob)
        for r in t.charlm_quality(df).collect()
    }
    for doc_id, s in samples:
        n_ref, score_ref = charlm_score_python(s)
        n_got, score_got = got[doc_id]
        assert n_got == n_ref, (doc_id, n_got, n_ref)
        assert abs(score_got - score_ref) < 2e-6, (doc_id, score_got, score_ref)


def test_charlm_separates_clean_from_garbage(spark):
    """The score must rank clean English above character garbage —
    the operator's reason to exist as a quality gate."""
    from cultural_heritage_bigdata_project_spark.operators import text as t

    df = spark.createDataFrame(
        [
            (0, "the old man reads his newspaper in the morning light"),
            (1, "xjq zvk wpf qqg hzx bnm vvk jjw qzx"),
        ],
        "doc_id long, text string",
    )
    scores = {r.doc_id: r.avg_logprob for r in t.charlm_quality(df).collect()}
    assert scores[0] > scores[1] + 1.0, scores


def test_charlm_plan_is_shuffle_free(spark):
    """The score must compute as ONE Arrow pass over the scan — the
    656-entry profile rides the mapInPandas closure as an O(1) dict,
    so there is no exchange of ANY kind (no explode shuffle, no
    broadcast, no aggregate): the per-doc sum runs at scan parallelism
    and scales embarrassingly (round-3 verdict item #2; the map-literal
    variant this replaced was a 656-way linear scan per character)."""
    from cultural_heritage_bigdata_project_spark.operators import text as t
    from cultural_heritage_bigdata_project_spark.sources.tables import load_table

    from .conftest import SF_DIR

    df = t.charlm_quality(
        load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan  # no explode


def test_dsir_referee_agreement_and_ranking(spark):
    """dsir_select must reproduce the pure-Python referee's
    (n_trigrams, avg_log_ratio) exactly AND rank target-language text
    above off-target text (its reason to exist)."""
    from cultural_heritage_bigdata_project_spark.functions.langid import (
        dsir_score_python,
    )
    from cultural_heritage_bigdata_project_spark.operators import text as t

    samples = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "el rapido zorro marron salta sobre el perro"),
        (2, "der schnelle braune fuchs springt uber den hund"),
        (3, "zzz qqq xxx vvv"),
    ]
    df = spark.createDataFrame(samples, "doc_id long, text string")
    rows = t.dsir_select(df, top_k=4).collect()
    got = {
        r.doc_id: (r.n_trigrams, r.n_matched, r.avg_log_ratio) for r in rows
    }
    for doc_id, s in samples:
        n_ref, nm_ref, score_ref = dsir_score_python(s)
        assert got[doc_id][0] == n_ref
        assert got[doc_id][1] == nm_ref
        if score_ref is None:
            assert got[doc_id][2] is None
        else:
            assert abs(got[doc_id][2] - score_ref) < 2e-6
    # ranking: English first, OOV garbage (no in-vocab evidence) last
    assert rows[0].doc_id == 0
    assert rows[-1].doc_id == 3 and rows[-1].avg_log_ratio is None
    top2 = {r.doc_id for r in t.dsir_select(df, top_k=2).collect()}
    assert 0 in top2 and 3 not in top2
