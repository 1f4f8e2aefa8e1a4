"""session_conf / scratch_name — the structural forms of the set/restore
conf pattern and the per-session side-state naming used by catalog entries
that own scratch databases or memory-sink views."""

from __future__ import annotations

import pytest

from cnics_to_fhir_spark.session import scratch_name, session_conf


def test_session_conf_restores_previous_value(spark):
    key = "spark.sql.autoBroadcastJoinThreshold"
    before = spark.conf.get(key)
    with session_conf(spark, {key: "-1"}):
        assert spark.conf.get(key) == "-1"
    assert spark.conf.get(key) == before


def test_session_conf_unsets_key_that_had_no_value(spark):
    key = "spark.cnics.test.ephemeral"
    assert spark.conf.get(key, None) is None
    with session_conf(spark, {key: "x"}):
        assert spark.conf.get(key) == "x"
    assert spark.conf.get(key, None) is None


def test_session_conf_restores_on_exception(spark):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with pytest.raises(RuntimeError):
        with session_conf(spark, {key: "7"}):
            assert spark.conf.get(key) == "7"
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before


def test_scratch_name_is_valid_identifier_and_session_unique(spark):
    name = scratch_name(spark, "j12_scratch")
    assert name.startswith("j12_scratch_")
    assert name.replace("_", "").isalnum()  # valid db/view identifier
    # same session → stable; suffix is the applicationId, so a different
    # session would get a different name (the concurrency guarantee)
    assert scratch_name(spark, "j12_scratch") == name
    assert spark.sparkContext.applicationId.replace("-", "_") in name
