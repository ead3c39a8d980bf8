"""The CLI entry must ship the same measured tuning defaults as the
library (VERDICT r01 item 5: the argparse default contradicted
pipeline.prepare's measured nsalt)."""

from __future__ import annotations

import inspect
import os
import sys

_JOBS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "jobs")


def _cli_default(flag: str, module: str = "run_pipeline"):
    sys.path.insert(0, _JOBS_DIR)
    import argparse
    import importlib

    job = importlib.import_module(module)

    captured = {}
    orig = argparse.ArgumentParser.parse_args

    def fake(self, *a, **k):
        captured["parser"] = self
        raise SystemExit(0)

    argparse.ArgumentParser.parse_args = fake
    try:
        job.main()
    except SystemExit:
        pass
    finally:
        argparse.ArgumentParser.parse_args = orig
    return captured["parser"].get_default(flag)


def test_cli_nsalt_matches_prepare_default():
    from nidaba_spark import pipeline

    lib_default = inspect.signature(pipeline.prepare).parameters["nsalt"].default
    assert _cli_default("nsalt") == lib_default == 256


def test_curate_cli_defaults_match_library():
    from nidaba_spark import curate

    sig = inspect.signature(curate.curate).parameters
    for cli_flag, lib_param in [
        ("min_quality", "min_quality"),
        ("pack_budget", "pack_budget"),
        ("nsalt", "nsalt"),
        ("default_rate", "default_rate"),
        ("repetition_max_frac", "repetition_max_frac"),
        ("dup_span_max_frac", "dup_span_max_frac"),
        ("dup_span_n", "dup_span_n"),
        ("near_dup_threshold", "near_dup_threshold"),
        ("max_docs_per_host", "max_docs_per_host"),
        ("paragraph_dedup", "paragraph_dedup"),
        ("gopher_repetition", "gopher_repetition"),
        ("line_dedup", "line_dedup"),
        ("min_model_score", "min_model_score"),
        ("decontam_bloom_fpp", "decontam_bloom_fpp"),
        ("decontam_fuzzy_threshold", "decontam_fuzzy_threshold"),
        ("min_published_date", "min_published_date"),
    ]:
        assert (
            _cli_default(cli_flag, "curate_corpus") == sig[lib_param].default
        ), cli_flag
