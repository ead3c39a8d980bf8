"""The CLI entry must ship the same measured tuning defaults as the
library (VERDICT r01 item 5: the argparse default contradicted
pipeline.prepare's measured nsalt)."""

from __future__ import annotations

import inspect
import os
import sys

_JOBS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "jobs")


def _cli_default(flag: str):
    sys.path.insert(0, _JOBS_DIR)
    import argparse

    import run_pipeline

    captured = {}
    orig = argparse.ArgumentParser.parse_args

    def fake(self, *a, **k):
        captured["parser"] = self
        raise SystemExit(0)

    argparse.ArgumentParser.parse_args = fake
    try:
        run_pipeline.main()
    except SystemExit:
        pass
    finally:
        argparse.ArgumentParser.parse_args = orig
    return captured["parser"].get_default(flag)


def test_cli_nsalt_matches_prepare_default():
    from nidaba_spark import pipeline

    lib_default = inspect.signature(pipeline.prepare).parameters["nsalt"].default
    assert _cli_default("nsalt") == lib_default == 256
