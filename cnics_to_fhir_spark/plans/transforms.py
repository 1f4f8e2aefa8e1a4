"""Scalar-transform queries (SURVEY.md §2.8) — each runs the ENGINE'S column
expressions (cnics_to_fhir_spark.functions.*) over strings synthesized from
the driver corpus, with a hand-written ANSI-SQL oracle replicating the
reference semantics independently. A hash match therefore validates the
transform layer itself, not just SQL round-tripping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cnics_to_fhir_spark.functions import coding, demographics, labs, medications
from cnics_to_fhir_spark.plans.registry import query, table

# A small synthetic standard-diagnosis list standing in for the 641-row code
# table (cnics_to_fhir.py:190-191); membership hits the standard-list branch.
_STD_DX = ["COPD", "Diabetes Mellitus Type 2", "Hypertension"]

# Deterministic variety: key % 6 → one dx string per dispatch branch
# (ICD-10, ICD-9, V-code, standard-list, SNOMED fallback, ICD-10-not-V).
_DX_CASE_SQL = """
    CASE l_partkey % 6
        WHEN 0 THEN 'E11.9'
        WHEN 1 THEN '250.00'
        WHEN 2 THEN 'V02.61'
        WHEN 3 THEN 'COPD'
        WHEN 4 THEN 'chronic cough, unspecified'
        ELSE 'J44.1'
    END
"""


def _dx_col() -> F.Column:
    k = F.col("l_partkey") % 6
    return (
        F.when(k == 0, F.lit("E11.9"))
        .when(k == 1, F.lit("250.00"))
        .when(k == 2, F.lit("V02.61"))
        .when(k == 3, F.lit("COPD"))
        .when(k == 4, F.lit("chronic cough, unspecified"))
        .otherwise(F.lit("J44.1"))
    )


@query(
    "f01_dx_coding_dispatch",
    tags="F1 F2 F3 F22 J8",
    oracle=f"""
        WITH src AS (
            SELECT l_orderkey, l_linenumber, {_DX_CASE_SQL} AS dx FROM lineitem
        )
        SELECT l_orderkey, l_linenumber, dx,
               CASE WHEN regexp_matches(dx, '^[A-Z][0-9]{{2}}') AND NOT regexp_matches(dx, '^V')
                         THEN 'http://hl7.org/fhir/sid/icd-10-cm'
                    WHEN regexp_matches(dx, '^[0-9]{{3}}') OR regexp_matches(dx, '^V[0-9]{{2}}')
                         THEN 'http://hl7.org/fhir/sid/icd-9-cm'
                    WHEN dx IN ('COPD', 'Diabetes Mellitus Type 2', 'Hypertension')
                         THEN 'https://cnics.cirg.washington.edu/diagnosis-name'
                    ELSE 'http://snomed.info/sct' END AS coding_system,
               CASE WHEN regexp_matches(dx, '^[A-Z][0-9]{{2}}') AND NOT regexp_matches(dx, '^V') THEN dx
                    WHEN regexp_matches(dx, '^[0-9]{{3}}') OR regexp_matches(dx, '^V[0-9]{{2}}') THEN dx
                    WHEN dx IN ('COPD', 'Diabetes Mellitus Type 2', 'Hypertension') THEN dx
                    ELSE '404684003' END AS coding_code,
               CASE WHEN regexp_matches(dx, '^[A-Z][0-9]{{2}}') AND NOT regexp_matches(dx, '^V') THEN dx
                    WHEN regexp_matches(dx, '^[0-9]{{3}}') OR regexp_matches(dx, '^V[0-9]{{2}}') THEN dx
                    WHEN dx IN ('COPD', 'Diabetes Mellitus Type 2', 'Hypertension') THEN dx
                    ELSE 'Clinical finding (finding): ' || dx END AS coding_display
        FROM src
    """,
)
def f01_dx_coding_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F3 regex dispatch (cnics_to_fhir.py:11-39) via functions/coding.py."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey")
    df = li.withColumn("dx", _dx_col())
    in_std = coding.standard_membership(F.col("dx"), _STD_DX)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        "dx",
        coding.dx_coding_system(F.col("dx"), in_std).alias("coding_system"),
        coding.dx_coding_code(F.col("dx"), in_std).alias("coding_code"),
        coding.dx_coding_display(F.col("dx"), in_std).alias("coding_display"),
    )


@query(
    "f05_dx_category_maps",
    tags="F5 F6 F7",
    oracle="""
        WITH src AS (
            SELECT event_id,
                   CASE event_type
                       WHEN 'signup'   THEN 'Data collected at CNICS site'
                       WHEN 'click'    THEN 'Patient reported without supporting outside documentation'
                       WHEN 'view'     THEN 'Reported in outside documentation'
                       WHEN 'error'    THEN 'Source unknown'
                       ELSE 'Verified clinical diagnosis'
                   END AS dx_type
            FROM events
        )
        SELECT event_id, dx_type,
               CASE dx_type
                   WHEN 'Data collected at CNICS site' THEN 'encounter-diagnosis'
                   WHEN 'Patient reported without supporting outside documentation' THEN 'health-concern'
                   WHEN 'Reported in outside documentation' THEN 'problem-list-item'
                   WHEN 'Source unknown' THEN 'health-concern'
                   WHEN 'Verified clinical diagnosis' THEN 'problem-list-item'
               END AS category,
               CASE dx_type
                   WHEN 'Data collected at CNICS site' THEN 'Encounter Diagnosis'
                   WHEN 'Patient reported without supporting outside documentation' THEN 'Health Concern'
                   WHEN 'Reported in outside documentation' THEN 'Problem List Item'
                   WHEN 'Source unknown' THEN 'Health Concern'
                   WHEN 'Verified clinical diagnosis' THEN 'Problem List Item'
               END AS category_display,
               CASE dx_type
                   WHEN 'Data collected at CNICS site' THEN 'confirmed'
                   WHEN 'Patient reported without supporting outside documentation' THEN 'unconfirmed'
                   WHEN 'Reported in outside documentation' THEN 'confirmed'
                   WHEN 'Source unknown' THEN 'unconfirmed'
                   WHEN 'Verified clinical diagnosis' THEN 'confirmed'
               END AS verification_status
        FROM src
    """,
)
def f05_dx_category_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5-F7 dict maps (cnics_to_fhir.py:225-244) via coding.map_lookup."""
    e = table(spark, sf_dir, "events").select("event_id", "event_type")
    t = F.col("event_type")
    dx_type = (
        F.when(t == "signup", F.lit("Data collected at CNICS site"))
        .when(t == "click", F.lit("Patient reported without supporting outside documentation"))
        .when(t == "view", F.lit("Reported in outside documentation"))
        .when(t == "error", F.lit("Source unknown"))
        .otherwise(F.lit("Verified clinical diagnosis"))
    )
    df = e.withColumn("dx_type", dx_type)
    cat = coding.dx_category(F.col("dx_type"))
    return df.select(
        "event_id",
        "dx_type",
        cat.alias("category"),
        coding.category_display(cat).alias("category_display"),
        coding.dx_verification_status(F.col("dx_type")).alias("verification_status"),
    )


@query(
    "f04_med_status",
    tags="F4",
    oracle="""
        WITH src AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderdate END AS start_date,
                   CASE WHEN o_orderkey % 2 = 0 THEN o_orderdate + INTERVAL 30 DAY ELSE NULL END AS end_date
            FROM orders
        )
        SELECT o_orderkey,
               CASE WHEN start_date IS NULL THEN 'unknown'
                    WHEN end_date IS NOT NULL THEN 'stopped'
                    ELSE 'active' END AS status
        FROM src
    """,
)
def f04_med_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 (cnics_to_fhir.py:41-46) via medications.med_status; null patterns
    synthesized from order keys.  Per-row output (15k rows at sf0.01), not
    the 3-row branch summary: the hash compare pins the status of every
    synthesized (start, end) null pattern individually."""
    o = table(spark, sf_dir, "orders")
    df = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 != 0, F.col("o_orderdate")).alias("start_date"),
        F.when(F.col("o_orderkey") % 2 == 0, F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("end_date"),
    )
    return df.select(
        "o_orderkey",
        medications.med_status(F.col("start_date"), F.col("end_date")).alias("status"),
    )


@query(
    "f08_demographic_maps",
    tags="F8 F9 F10",
    oracle="""
        WITH src AS (
            SELECT event_id,
                   CASE event_id % 9
                       WHEN 0 THEN 'American Indian' WHEN 1 THEN 'Asian'
                       WHEN 2 THEN 'Asian/Pacific Islander' WHEN 3 THEN 'Black'
                       WHEN 4 THEN 'Pacific Islander' WHEN 5 THEN 'White'
                       WHEN 6 THEN 'Multiracial' WHEN 7 THEN 'Other'
                       ELSE NULL END AS race,
                   CASE event_id % 3 WHEN 0 THEN 'Yes' WHEN 1 THEN 'No' ELSE NULL END AS hispanic,
                   CASE event_id % 4 WHEN 0 THEN 'Female' WHEN 1 THEN 'Male'
                        WHEN 2 THEN 'Unknown' ELSE NULL END AS sex
            FROM events
        )
        SELECT event_id,
               CASE race
                   WHEN 'American Indian' THEN '1002-5' WHEN 'Asian' THEN '2028-9'
                   WHEN 'Asian/Pacific Islander' THEN '2076-8' WHEN 'Black' THEN '2054-5'
                   WHEN 'Pacific Islander' THEN '2076-8' WHEN 'White' THEN '2106-3'
                   WHEN 'Multiracial' THEN '2131-1' WHEN 'Other' THEN '2131-1' END AS race_code,
               CASE race
                   WHEN 'American Indian' THEN 'American Indian or Alaska Native'
                   WHEN 'Asian' THEN 'Asian'
                   WHEN 'Asian/Pacific Islander' THEN 'Native Hawaiian or Other Pacific Islander'
                   WHEN 'Black' THEN 'Black or African American'
                   WHEN 'Pacific Islander' THEN 'Native Hawaiian or Other Pacific Islander'
                   WHEN 'White' THEN 'White'
                   WHEN 'Multiracial' THEN 'Other Race' WHEN 'Other' THEN 'Other Race' END AS race_display,
               CASE hispanic WHEN 'No' THEN '2186-5' WHEN 'Yes' THEN '2135-2' END AS eth_code,
               CASE sex WHEN 'Female' THEN 'F' WHEN 'Male' THEN 'M' END AS birth_sex,
               CASE WHEN sex IN ('Female','Male') THEN LOWER(sex) END AS gender
        FROM src
    """,
)
def f08_demographic_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8-F10 (cnics_to_fhir.py:444-523) via functions/demographics.py."""
    e = table(spark, sf_dir, "events").select("event_id")
    k = F.col("event_id")
    race = (
        F.when(k % 9 == 0, F.lit("American Indian"))
        .when(k % 9 == 1, F.lit("Asian"))
        .when(k % 9 == 2, F.lit("Asian/Pacific Islander"))
        .when(k % 9 == 3, F.lit("Black"))
        .when(k % 9 == 4, F.lit("Pacific Islander"))
        .when(k % 9 == 5, F.lit("White"))
        .when(k % 9 == 6, F.lit("Multiracial"))
        .when(k % 9 == 7, F.lit("Other"))
    )
    hispanic = F.when(k % 3 == 0, F.lit("Yes")).when(k % 3 == 1, F.lit("No"))
    sex = (
        F.when(k % 4 == 0, F.lit("Female"))
        .when(k % 4 == 1, F.lit("Male"))
        .when(k % 4 == 2, F.lit("Unknown"))
    )
    df = e.select("event_id", race.alias("race"), hispanic.alias("hispanic"), sex.alias("sex"))
    race_struct = demographics.race_coding(F.col("race"))
    eth_struct = demographics.ethnicity_coding(F.col("hispanic"))
    return df.select(
        "event_id",
        race_struct["code"].alias("race_code"),
        race_struct["display"].alias("race_display"),
        eth_struct["code"].alias("eth_code"),
        demographics.birth_sex_code(F.col("sex")).alias("birth_sex"),
        demographics.gender(F.col("sex")).alias("gender"),
    )


# Lab Result strings covering every branch of the value-typing union
# (cnics_to_fhir.py:804-827), incl. the sharp edges: '+ 3' (signed, spaced
# integer), '1e5' (sci-notation decimal), '-0.5', '4-6' (range), '<7.0',
# '>=6.5' (comparators), '00'/' 5' (NON-matches → valueString).
_RESULT_CASE_SQL = """
    CASE o_orderkey % 10
        WHEN 0 THEN '42'
        WHEN 1 THEN '+ 3'
        WHEN 2 THEN '4-6'
        WHEN 3 THEN '5.7'
        WHEN 4 THEN '1e5'
        WHEN 5 THEN '<7.0'
        WHEN 6 THEN '>=6.5'
        WHEN 7 THEN 'POSITIVE'
        WHEN 8 THEN '-0.5'
        ELSE '00'
    END
"""


def _result_col() -> F.Column:
    k = F.col("o_orderkey") % 10
    return (
        F.when(k == 0, F.lit("42"))
        .when(k == 1, F.lit("+ 3"))
        .when(k == 2, F.lit("4-6"))
        .when(k == 3, F.lit("5.7"))
        .when(k == 4, F.lit("1e5"))
        .when(k == 5, F.lit("<7.0"))
        .when(k == 6, F.lit(">=6.5"))
        .when(k == 7, F.lit("POSITIVE"))
        .when(k == 8, F.lit("-0.5"))
        .otherwise(F.lit("00"))
    )


@query(
    "f11_lab_value_typing",
    tags="F11 F18 F22",
    oracle="""
        WITH src AS (
            SELECT o_orderkey, """ + _RESULT_CASE_SQL + """ AS result FROM orders
        ),
        typed AS (
            SELECT o_orderkey, result,
                   regexp_matches(result, '^([0]|[-+]?\\s*[1-9][0-9]*)$') AS is_int,
                   regexp_matches(result, '^([0]|[-+]?\\s*[1-9][0-9]*)\\s*-\\s*([0]|[-+]?\\s*[1-9][0-9]*)$') AS is_range,
                   regexp_matches(result, '^(-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?)$') AS is_dec,
                   regexp_matches(result, '^(<|<=|>=|>)(-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?)$') AS is_cmp
            FROM src
        )
        SELECT o_orderkey, result,
               CASE WHEN is_int THEN 'valueInteger'
                    WHEN is_range THEN 'valueRange'
                    WHEN is_dec THEN 'valueQuantity'
                    WHEN is_cmp THEN 'valueQuantity'
                    ELSE 'valueString' END AS value_type,
               CASE WHEN is_int THEN CAST(regexp_replace(result, '\\s+', '', 'g') AS INTEGER) END AS value_integer,
               CASE WHEN NOT is_int AND NOT is_range AND is_dec THEN CAST(result AS DOUBLE)
                    WHEN NOT is_int AND NOT is_range AND NOT is_dec AND is_cmp
                         THEN CAST(regexp_extract(result, '^(<|<=|>=|>)(-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?)$', 2) AS DOUBLE)
                    END AS value_quantity,
               CASE WHEN NOT is_int AND NOT is_range AND NOT is_dec AND is_cmp
                         THEN regexp_extract(result, '^(<|<=|>=|>)(-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?)$', 1)
                    END AS value_comparator,
               CASE WHEN NOT is_int AND is_range
                         THEN CAST(regexp_replace(regexp_extract(result, '^([0]|[-+]?\\s*[1-9][0-9]*)\\s*-\\s*([0]|[-+]?\\s*[1-9][0-9]*)$', 1), '\\s+', '', 'g') AS DOUBLE)
                    END AS value_range_low,
               CASE WHEN NOT is_int AND is_range
                         THEN CAST(regexp_replace(regexp_extract(result, '^([0]|[-+]?\\s*[1-9][0-9]*)\\s*-\\s*([0]|[-+]?\\s*[1-9][0-9]*)$', 2), '\\s+', '', 'g') AS DOUBLE)
                    END AS value_range_high,
               CASE WHEN NOT is_int AND NOT is_range AND NOT is_dec AND NOT is_cmp
                         THEN result END AS value_string
        FROM typed
    """,
)
def f11_lab_value_typing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 tagged-union value typing (cnics_to_fhir.py:799-827) via
    functions/labs.py, flattened for comparison."""
    o = table(spark, sf_dir, "orders").select("o_orderkey")
    df = o.withColumn("result", _result_col())
    v = labs.typed_value_struct(F.col("result"))
    return df.select("o_orderkey", "result", *[v[f].alias(f) for f in [
        "value_type", "value_integer", "value_quantity", "value_comparator",
        "value_range_low", "value_range_high", "value_string",
    ]])


@query(
    "f12_unit_default_refrange",
    tags="F12 F13",
    oracle="""
        WITH src AS (
            SELECT event_id,
                   CASE event_id % 3 WHEN 0 THEN NULL WHEN 1 THEN 'mg/dL' ELSE 'mmol/L' END AS units,
                   CASE event_id % 4 WHEN 0 THEN '3.5' WHEN 1 THEN 'neg' WHEN 2 THEN NULL ELSE '0.2' END AS ref_low,
                   CASE event_id % 5 WHEN 0 THEN '7.5' WHEN 1 THEN 'high' ELSE NULL END AS ref_high
            FROM events
        )
        SELECT event_id,
               COALESCE(units, '%') AS unit,
               CASE WHEN regexp_matches(COALESCE(ref_low, ''), '^(-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?)$')
                         THEN CAST(ref_low AS DOUBLE) END AS ref_range_low,
               CASE WHEN regexp_matches(COALESCE(ref_high, ''), '^(-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?)$')
                         THEN CAST(ref_high AS DOUBLE) END AS ref_range_high,
               (regexp_matches(COALESCE(ref_low, ''), '^(-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?)$')
                OR regexp_matches(COALESCE(ref_high, ''), '^(-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?)$')) AS has_ref_range
        FROM src
    """,
)
def f12_unit_default_refrange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 unit defaulting + F13 reference-range gating
    (cnics_to_fhir.py:836-886) via functions/labs.py."""
    e = table(spark, sf_dir, "events").select("event_id")
    k = F.col("event_id")
    units = F.when(k % 3 == 1, F.lit("mg/dL")).when(k % 3 == 2, F.lit("mmol/L"))
    ref_low = (
        F.when(k % 4 == 0, F.lit("3.5")).when(k % 4 == 1, F.lit("neg")).when(k % 4 == 3, F.lit("0.2"))
    )
    ref_high = F.when(k % 5 == 0, F.lit("7.5")).when(k % 5 == 1, F.lit("high"))
    df = e.select(
        "event_id", units.alias("units"), ref_low.alias("ref_low"), ref_high.alias("ref_high")
    )
    return df.select(
        "event_id",
        labs.effective_unit(F.col("units")).alias("unit"),
        labs.ref_range_value(F.col("ref_low")).alias("ref_range_low"),
        labs.ref_range_value(F.col("ref_high")).alias("ref_range_high"),
        (labs.is_decimal_text(F.col("ref_low")) | labs.is_decimal_text(F.col("ref_high"))).alias("has_ref_range"),
    )


@query(
    "f17_date_format",
    tags="F17 F19 F15",
    oracle="""
        SELECT STRFTIME(o_orderdate, '%Y-%m') AS order_month,
               'https://cnics.cirg.washington.edu/site-patient-id/' || LOWER(o_orderstatus) AS id_system,
               COUNT(*) AS n
        FROM orders
        GROUP BY 1, 2
    """,
)
def f17_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 strftime + F19 system-URL concat + F15 lower
    (cnics_to_fhir.py:614, :387, :354)."""
    from cnics_to_fhir_spark.functions import text as tf

    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            tf.identifier_system(
                "https://cnics.cirg.washington.edu/site-patient-id/", F.col("o_orderstatus")
            ).alias("id_system"),
        )
        .groupBy("order_month", "id_system")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "f14_string_cleanup",
    tags="F14 F16 F19",
    oracle="""
        SELECT doc_id,
               regexp_replace(text, '"', '', 'g') AS no_quotes,
               replace(replace(text, '  ', CHR(1)), CHR(1), ' ') AS collapsed,
               LOWER(source) AS src_lower,
               source || ':' || CAST(doc_id AS VARCHAR) AS joined_key
        FROM documents
    """,
)
def f14_string_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14/F15/F19 string ops (cnics_to_fhir.py:191, :702, :354, :271)."""
    from cnics_to_fhir_spark.functions import text as tf

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tf.strip_quotes(F.col("text")).alias("no_quotes"),
        tf.collapse_double_spaces(F.col("text")).alias("collapsed"),
        tf.lower_site(F.col("source")).alias("src_lower"),
        F.concat_ws(":", F.col("source"), F.col("doc_id").cast("string")).alias("joined_key"),
    )
