"""CLI argument contract (no Spark session needed — validation happens
before the session is built)."""

import pytest

from nimbus_crawler_spark.cli import main


def test_seeds_required_unless_resume(tmp_path):
    with pytest.raises(SystemExit) as e:
        main(["--pages", str(tmp_path), "--warehouse", str(tmp_path / "wh")])
    assert e.value.code == 2  # argparse error exit


def test_seeds_file_and_urls_mutually_exclusive(tmp_path):
    with pytest.raises(SystemExit) as e:
        main([
            "--pages", str(tmp_path), "--warehouse", str(tmp_path / "wh"),
            "--seeds-file", "s.txt", "--seed-urls", "https://a.example",
        ])
    assert e.value.code == 2


def test_pages_and_warehouse_required():
    with pytest.raises(SystemExit) as e:
        main(["--seed-urls", "https://a.example"])
    assert e.value.code == 2
