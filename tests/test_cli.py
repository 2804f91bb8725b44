"""Direct smoke of the ``python -m python_lambda_ecs_container_data_etl_aws_spark``
entry point (round-4 verdict item 8: the only user-facing surface
without a direct test). Runs ``main()`` in-process — getOrCreate
reuses the suite's session, so this also exercises the CLI's
end-of-run ``clearCache()`` on a shared session."""

from __future__ import annotations

import os

from python_lambda_ecs_container_data_etl_aws_spark.__main__ import main
from tests.conftest import SF_DIR


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.splitlines()
    from python_lambda_ecs_container_data_etl_aws_spark.plans import QUERIES

    assert out == sorted(QUERIES)


def test_cli_run_prints_table(spark, capsys):
    assert main(["run", "q01_ingest_count", "--sf-dir", SF_DIR]) == 0
    out = capsys.readouterr().out
    assert "n_rows" in out
    # the CLI released its caches on the shared session
    assert not spark.sparkContext._jsc.getPersistentRDDs()


def test_cli_run_explain(capsys):
    assert main(["run", "q05_report_aggregate", "--sf-dir", SF_DIR,
                 "--explain"]) == 0
    assert "Physical Plan" in capsys.readouterr().out


def test_cli_run_out_csv(tmp_path, capsys):
    out = str(tmp_path / "report.csv")
    assert main(["run", "q05_report_aggregate", "--sf-dir", SF_DIR,
                 "--out", out]) == 0
    printed = capsys.readouterr().out
    assert printed.startswith("wrote ")
    path = printed.split("wrote ", 1)[1].strip()
    assert os.path.isfile(path) and open(path).readline().count(",") >= 1


def test_cli_unknown_query_suggests(capsys):
    assert main(["run", "q01_ingest_cnt"]) == 2
    assert "did you mean" in capsys.readouterr().err


def test_cli_verify_match(spark, capsys):
    assert main(["verify", "q05_report_aggregate", "--sf-dir", SF_DIR]) == 0
    assert "MATCH" in capsys.readouterr().out


def test_cli_verify_rows_only(spark, capsys):
    assert main(["verify", "q27_ann_lsh_topk", "--sf-dir", SF_DIR]) == 0
    assert "rows-only" in capsys.readouterr().out
