"""Command-line interface.

Parity: reference ``src/mdp/cli/main.py:29-225`` — commands ``version``,
``stages``, ``inspect`` (scan→filter→limit→format), ``run`` (registry
lookup by name, JSON config files, repeatable ``--transformer``,
``--dry-run``, ``--max-batches``). The reference cannot configure
transformers from the CLI (default-constructed configs, ``main.py:
194-197`` — quirk R5); here every ``--transformer`` takes an optional
``NAME=CONFIG.json`` so decom/calibration are actually usable.

Run as ``python -m mission_data_pipeline_spark.cli <command>`` (or the
same module via ``spark-submit`` on a cluster).
"""

from __future__ import annotations

import json
import sys

import click

import mission_data_pipeline_spark.stages  # noqa: F401 - registers built-ins
from mission_data_pipeline_spark import __version__, get_spark
from mission_data_pipeline_spark.core import Pipeline, PipelineConfig, registry
from mission_data_pipeline_spark.observability import configure_logging


@click.group()
@click.option("--log-level", default="INFO", show_default=True)
@click.option(
    "--log-format",
    "log_fmt",
    type=click.Choice(["console", "json"]),
    default="console",
    show_default=True,
)
def cli(log_level: str, log_fmt: str) -> None:
    """mission_data_pipeline_spark — PySpark telemetry analytics engine."""
    configure_logging(level=log_level, fmt=log_fmt)


@cli.command()
def version() -> None:
    """Print engine version."""
    click.echo(f"mission_data_pipeline_spark {__version__}")


@cli.command()
def stages() -> None:
    """List registered pipeline stages."""
    click.echo("extractors:")
    for n in registry.list_extractors():
        click.echo(f"  {n}")
    click.echo("transformers:")
    for n in registry.list_transformers():
        click.echo(f"  {n}")
    click.echo("loaders:")
    for n in registry.list_loaders():
        click.echo(f"  {n}")


@cli.command()
@click.argument("path")
@click.option("--max-packets", default=20, show_default=True)
@click.option("--apid", "apids", multiple=True, type=int, help="APID filter")
@click.option("--frame-sync", is_flag=True)
@click.option("--master", default="local[*]", show_default=True)
def inspect(
    path: str, max_packets: int, apids: tuple[int, ...], frame_sync: bool, master: str
) -> None:
    """Scan a binary file and print packet headers (reference ``inspect``).

    The ad-hoc query: SELECT header_fields FROM binary_scan
    WHERE apid IN (...) LIMIT n.
    """
    from mission_data_pipeline_spark.sources import read_packets

    spark = get_spark(app_name="mdps-inspect", master=master)
    spark.sparkContext.setLogLevel("ERROR")
    df = read_packets(
        spark, path, apid_filter=list(apids) or None, frame_sync=frame_sync
    )
    rows = (
        df.select(
            "apid", "version", "packet_type", "sec_hdr_flag",
            "seq_flags", "seq_count", "data_length", "file_offset",
        )
        .limit(max_packets)
        .collect()
    )
    hdr = f"{'apid':>6} {'ver':>3} {'type':>4} {'shf':>3} {'seqf':>4} {'seq':>6} {'len':>6} {'offset':>10}"
    click.echo(hdr)
    click.echo("-" * len(hdr))
    for r in rows:
        click.echo(
            f"{r['apid']:#06x} {r['version']:>3} {r['packet_type']:>4} "
            f"{r['sec_hdr_flag']:>3} {r['seq_flags']:>4} {r['seq_count']:>6} "
            f"{r['data_length']:>6} {r['file_offset']:>10}"
        )
    click.echo(f"{len(rows)} packet(s) shown")


def _load_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


@cli.command()
@click.option("--name", default="cli-pipeline", show_default=True)
@click.option("--extractor", "extractor_spec", required=True,
              help="NAME=CONFIG.json")
@click.option("--transformer", "transformer_specs", multiple=True,
              help="NAME or NAME=CONFIG.json (repeatable, applied in order)")
@click.option("--loader", "loader_spec", default=None, help="NAME=CONFIG.json")
@click.option("--dry-run", is_flag=True)
@click.option("--max-batches", type=int, default=None)
@click.option("--no-stop-on-error", is_flag=True)
@click.option("--master", default="local[*]", show_default=True)
def run(
    name: str,
    extractor_spec: str,
    transformer_specs: tuple[str, ...],
    loader_spec: str | None,
    dry_run: bool,
    max_batches: int | None,
    no_stop_on_error: bool,
    master: str,
) -> None:
    """Run a pipeline assembled from registered stages."""

    def parse(spec: str, get) -> object:
        sname, _, cfg_path = spec.partition("=")
        cls = get(sname)
        cfg = _load_json(cfg_path) if cfg_path else None
        return cls(cfg)

    try:
        extractor = parse(extractor_spec, registry.get_extractor)
        transformers = [parse(s, registry.get_transformer) for s in transformer_specs]
        loader = parse(loader_spec, registry.get_loader) if loader_spec else None
    except KeyError as e:
        raise click.ClickException(str(e)) from None

    spark = get_spark(app_name=f"mdps-{name}", master=master)
    spark.sparkContext.setLogLevel("ERROR")
    pipeline = Pipeline(
        PipelineConfig(
            name=name,
            dry_run=dry_run,
            max_batches=max_batches,
            stop_on_error=not no_stop_on_error,
        ),
        extractor=extractor,
        transformers=transformers,
        loader=loader,
    )
    result = pipeline.run(spark)
    click.echo(result.summary())
    if not result.ok:
        sys.exit(1)


@cli.group()
def query() -> None:
    """Browse and run the declared query library.

    Every entry is an oracle-checked operator demonstration from the
    coverage map (COVERAGE.md / SURVEY.md §2) over the standard test
    tables. Mirrors the reference's registry-driven CLI design
    (``src/mdp/cli/main.py:29-225``: discoverable named components,
    runnable by name) for the query surface.
    """


@query.command("list")
@click.option("--tag", default=None,
              help="substring filter on the SURVEY §2 id (e.g. X2, W, L)")
@click.option("--grep", default=None,
              help="substring filter on name or description")
def query_list(tag: str | None, grep: str | None) -> None:
    """List declared queries: NAME [SURVEY-ID] DESCRIPTION."""
    from mission_data_pipeline_spark.plans.queries import QUERIES

    n = 0
    for name in sorted(QUERIES):
        q = QUERIES[name]
        if tag and tag.lower() not in q.survey_id.lower():
            continue
        if grep and (
            grep.lower() not in name.lower()
            and grep.lower() not in q.description.lower()
        ):
            continue
        desc = " ".join(q.description.split())
        if len(desc) > 90:
            desc = desc[:87] + "..."
        click.echo(f"{name:<40} [{q.survey_id}] {desc}")
        n += 1
    click.echo(f"{n} quer{'y' if n == 1 else 'ies'}")


@query.command("run")
@click.argument("name")
@click.option("--sf", "sf_dir", default="/root/testdata/sf0.01",
              show_default=True, help="directory of test-table parquet")
@click.option("--explain", is_flag=True,
              help="print the formatted physical plan instead of rows")
@click.option("--max-rows", default=20, show_default=True)
@click.option("--oracle", "show_oracle", is_flag=True,
              help="print the DuckDB oracle SQL and exit (no Spark)")
@click.option("--master", default="local[*]", show_default=True)
def query_run(
    name: str,
    sf_dir: str,
    explain: bool,
    max_rows: int,
    show_oracle: bool,
    master: str,
) -> None:
    """Run (or explain) one declared query by name."""
    from mission_data_pipeline_spark.plans.queries import QUERIES

    if name not in QUERIES:
        import difflib

        close = difflib.get_close_matches(name, QUERIES, n=3)
        hint = f" (did you mean: {', '.join(close)}?)" if close else ""
        raise click.ClickException(f"unknown query {name!r}{hint}")
    q = QUERIES[name]
    if show_oracle:
        if q.oracle is None:
            raise click.ClickException(
                f"{name} has no SQL oracle (non-SQL-expressible; "
                "rows-only checked)"
            )
        click.echo(q.oracle.strip())
        return
    spark = get_spark(app_name=f"mdps-query-{name}", master=master)
    spark.sparkContext.setLogLevel("ERROR")
    df = q.spark(spark, sf_dir)
    if explain:
        df.explain("formatted")
        return
    df.show(n=max_rows, truncate=40)


if __name__ == "__main__":
    cli()
