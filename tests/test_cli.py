"""CLI front door: the registry-only subcommands (no Spark session)."""

from __future__ import annotations

from caseguarddatapipeline_spark.__main__ import main


def test_list_and_oracle(capsys):
    assert main(["list", "e1_"]) == 0
    out = capsys.readouterr().out
    assert "e1_exact_dedup\tsql" in out

    assert main(["oracle", "p1_active_filter"]) == 0
    assert "FROM orders" in capsys.readouterr().out

    assert main(["oracle", "nope"]) == 2
    # rows-only: no oracle (the one remaining policy entry, a16)
    assert main(["oracle", "a16_approx_distinct_users"]) == 1
