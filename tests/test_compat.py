"""Hadoop-version jobconf compatibility (dataflow/compat.py — the
reference mrjob/compat.py contract: two-way name translation, version
gates, and any-variant lookups for task code)."""

from __future__ import annotations

import logging

import pytest

from mrjob_spark.dataflow.compat import (
    jobconf_from_dict,
    jobconf_from_env,
    map_version,
    translate_jobconf,
    translate_jobconf_dict,
    translate_jobconf_for_all_versions,
    uses_yarn,
    version_gte,
)


def test_version_gte_pads_and_ignores_nonnumeric():
    assert version_gte("2", "2.0.0")
    assert version_gte("2.0.0", "2")
    assert not version_gte("1.2.1", "2")
    assert version_gte("3.3.6", "2.7")
    assert version_gte("2.7.1-amzn-0", "2.7.1")


def test_uses_yarn_gate():
    assert uses_yarn("2.0.0") and uses_yarn("3.3.6")
    # YARN originated in the 0.23 series (the reference's special case)
    assert uses_yarn("0.23.5")
    assert not uses_yarn("1.2.1") and not uses_yarn("0.20.205")


def test_map_version_picks_newest_at_or_below():
    vm = {"1.0": "old", "2.0": "new"}
    assert map_version("1.2.1", vm) == "old"
    assert map_version("3.3.6", vm) == "new"
    assert map_version("0.20", vm) == "old"  # below every key -> earliest
    with pytest.raises(ValueError):
        map_version("1.0", {})
    with pytest.raises(TypeError):
        map_version(None, vm)


def test_translate_jobconf_both_directions():
    assert translate_jobconf("mapred.reduce.tasks", "3.3.6") == \
        "mapreduce.job.reduces"
    assert translate_jobconf("mapreduce.job.reduces", "1.2.1") == \
        "mapred.reduce.tasks"
    # unknown names pass through at any version
    assert translate_jobconf("my.custom.knob", "1.2.1") == "my.custom.knob"


def test_translate_for_all_versions_is_sorted_superset():
    got = translate_jobconf_for_all_versions("mapreduce.job.reduces")
    assert got == ["mapred.reduce.tasks", "mapreduce.job.reduces"]
    assert translate_jobconf_for_all_versions("my.custom.knob") == \
        ["my.custom.knob"]


def test_translate_dict_combines_and_warns(caplog):
    jobconf = {"mapred.reduce.tasks": "4", "my.custom.knob": "x"}
    with caplog.at_level(logging.WARNING,
                         logger="mrjob_spark.dataflow.compat"):
        out = translate_jobconf_dict(jobconf, "3.3.6")
    # original preserved, translation added, unknown untouched
    assert out["mapred.reduce.tasks"] == "4"
    assert out["mapreduce.job.reduces"] == "4"
    assert out["my.custom.knob"] == "x"
    assert "mapred.reduce.tasks -> mapreduce.job.reduces" in caplog.text
    # no version: every variant appears, no warning
    caplog.clear()
    out2 = translate_jobconf_dict({"map.input.file": "f"})
    assert out2["mapreduce.map.input.file"] == "f"
    assert not caplog.records


def test_translate_dict_no_duplicate_when_both_set():
    # user already set both dialects: values kept verbatim, no overwrite
    jobconf = {"mapred.reduce.tasks": "4", "mapreduce.job.reduces": "8"}
    out = translate_jobconf_dict(jobconf, "3.3.6")
    assert out["mapred.reduce.tasks"] == "4"
    assert out["mapreduce.job.reduces"] == "8"


def test_jobconf_from_env_tries_variants(monkeypatch):
    monkeypatch.setenv("mapreduce_map_input_file", "/data/part-0")
    # task code written against Hadoop 1 still finds it
    assert jobconf_from_env("map.input.file") == "/data/part-0"
    assert jobconf_from_env("mapreduce.map.input.file") == "/data/part-0"
    assert jobconf_from_env("no.such.var", "dflt") == "dflt"


def test_jobconf_from_dict_tries_variants():
    d = {"mapred.task.partition": "3"}
    assert jobconf_from_dict(d, "mapreduce.task.partition") == "3"
    assert jobconf_from_dict(d, "mapred.task.partition") == "3"
    assert jobconf_from_dict(d, "nope", 7) == 7


def test_runner_accepts_pre_yarn_reduce_count(spark, tmp_path):
    """A job configured with the Hadoop-1 name still controls the
    shuffle partition count on the Spark runner (variant-tolerant
    jobconf read in every runner)."""
    from mrjob_spark.dataflow.job import SparkMRJob
    from mrjob_spark.dataflow.step import MRStep

    class MRWC(SparkMRJob):
        def steps(self):
            return [MRStep(mapper=self.m, reducer=self.r)]

        def m(self, _, line):
            for w in line.split():
                yield w, 1

        def r(self, w, counts):
            yield w, sum(counts)

    inp = tmp_path / "in.txt"
    inp.write_text("a b a\n")
    r = MRWC().make_runner(
        spark, input_paths=[str(inp)],
        jobconf={"mapred.reduce.tasks": "3"},
    )
    assert r.num_reducers == 3


def test_translation_round_trips_by_property():
    """Property over the whole table: translating any known name to one
    dialect and back lands on that dialect's canonical name, and
    from_env/from_dict agree with translate_jobconf_for_all_versions."""
    from mrjob_spark.dataflow.compat import _JOBCONF_RENAMES

    for old, new in _JOBCONF_RENAMES:
        assert translate_jobconf(old, "2.7.1") == new
        assert translate_jobconf(new, "1.0.3") == old
        assert translate_jobconf(translate_jobconf(old, "3.3.6"),
                                 "1.2.1") == old
        variants = translate_jobconf_for_all_versions(old)
        assert set(variants) == {old, new}
        assert translate_jobconf_for_all_versions(new) == variants
        # a dict carrying either name answers to both
        for present, value in ((old, "x"), (new, "y")):
            d = {present: value}
            assert jobconf_from_dict(d, old) == value
            assert jobconf_from_dict(d, new) == value
