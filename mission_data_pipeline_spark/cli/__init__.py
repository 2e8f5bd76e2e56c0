"""CLI — SURVEY §2.9 R5 (reference ``src/mdp/cli/main.py:29-225``)."""

from mission_data_pipeline_spark.cli.main import cli

__all__ = ["cli"]
