"""CLI parity with the reference's main.py modes (main.py:226-285)."""

from __future__ import annotations

from weather4cast_bigdata_spark.__main__ import main


def test_cli_evaluate(spark, capsys):
    assert main(["evaluate"]) == 0
    out = capsys.readouterr().out
    assert "valid start times:" in out
    assert "temperature:" in out


def test_cli_submit_roundtrip(spark, tmp_path, capsys):
    sub = str(tmp_path / "sub")
    assert main(["submit", "--submission-dir", sub]) == 0
    assert "quantized cells" in capsys.readouterr().out
    back = spark.read.parquet(sub)
    assert back.count() > 0
    assert {"region", "day"} <= set(back.columns)


def test_cli_ensemble_ridge_beats_equal(spark, capsys):
    assert main(["evaluate_ensemble", "--ensemble-weights", "ridge"]) == 0
    ridge = float(capsys.readouterr().out.rsplit("blend mse:", 1)[1])
    assert main(["evaluate_ensemble", "--ensemble-weights", "equal"]) == 0
    equal = float(capsys.readouterr().out.rsplit("blend mse:", 1)[1])
    assert ridge < equal


def test_cli_region_filter(spark, capsys):
    assert main(["evaluate", "--regions", "R1"]) == 0
    assert "valid start times:" in capsys.readouterr().out


def test_cli_ensemble_lagrange_weights_sum_to_one(spark, capsys):
    assert main(["evaluate_ensemble", "--ensemble-weights", "ridge_lagrange"]) == 0
    out = capsys.readouterr().out
    weights = eval(out.split("weights (ridge_lagrange):", 1)[1].splitlines()[0].strip())
    assert abs(sum(weights) - 1.0) < 1e-3


def test_cli_external_frames_dir(spark, tmp_path, capsys):
    """--frames-dir points the same modes at any Parquet frame lake
    (the etl_to_parquet output) instead of the bundled fixtures."""
    from weather4cast_bigdata_spark.sources import weather_fixtures

    lake = str(tmp_path / "frames")
    weather_fixtures.load_fixtures(spark)["frames"].write.parquet(lake)
    assert main(["evaluate", "--frames-dir", lake]) == 0
    assert "valid start times:" in capsys.readouterr().out


def test_cli_curate_and_audit(spark, tmp_path, capsys):
    out = str(tmp_path / "curated")
    docs = "/root/testdata/sf0.001/documents.parquet"
    assert main(["curate", "--docs-dir", docs, "--output-dir", out]) == 0
    txt = capsys.readouterr().out
    assert "curated total:" in txt and "train:" in txt
    assert spark.read.parquet(out).count() > 0

    assert main(["audit", "--docs-dir", docs]) == 0
    txt = capsys.readouterr().out
    assert "text_nonempty:" in txt and "doc_id_unique:" in txt


def test_cli_curate_requires_docs_dir(spark):
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["curate"])


def test_cli_decontaminate_and_pack(spark, tmp_path, capsys):
    docs = "/root/testdata/sf0.001/documents.parquet"
    assert main(
        ["decontaminate", "--docs-dir", docs, "--eval-dir", docs, "--min-overlap", "1"]
    ) == 0
    txt = capsys.readouterr().out
    # eval set == training set → every doc with >=1 shingle self-collides
    assert "contaminated:" in txt

    out = str(tmp_path / "packed")
    assert main(["pack", "--docs-dir", docs, "--capacity", "64", "--output-dir", out]) == 0
    txt = capsys.readouterr().out
    assert "sequences of 64" in txt
    assert spark.read.parquet(out).count() > 0


def test_cli_decontaminate_requires_eval_dir(spark):
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["decontaminate", "--docs-dir", "/root/testdata/sf0.001/documents.parquet"])


def test_cli_decontaminate_bloom(spark, capsys):
    docs = "/root/testdata/sf0.001/documents.parquet"
    assert main(
        ["decontaminate", "--docs-dir", docs, "--eval-dir", docs,
         "--min-overlap", "1", "--bloom"]
    ) == 0
    # eval set == training set → every shingled doc self-collides
    # (bloom has false positives only, so the count can't be lower)
    assert "contaminated:" in capsys.readouterr().out


def test_cli_sql_mode(spark, tmp_path, capsys):
    lake = "/root/testdata/sf0.001"
    assert main(
        ["sql", "--lake-dir", lake,
         "--query", "SELECT count(*) AS n FROM documents"]
    ) == 0
    assert "500" in capsys.readouterr().out

    out = str(tmp_path / "sqlout")
    assert main(
        ["sql", "--lake-dir", lake, "--output-dir", out,
         "--query",
         "SELECT o_orderpriority, count(*) AS n FROM orders "
         "GROUP BY 1 ORDER BY 1"]
    ) == 0
    txt = capsys.readouterr().out
    assert "registered views:" in txt and "lineitem" in txt
    assert spark.read.parquet(out).count() > 0


def test_cli_sql_requires_lake_and_query(spark):
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["sql", "--lake-dir", "/root/testdata/sf0.001"])


def test_cli_ingest_builds_lake_and_submit_runs_off_it(spark, tmp_path, capsys):
    """The migrating user's first command: ingest the reference-layout
    NetCDF tree into the partitioned Parquet frame lake, then run
    submit end-to-end off the ingested lake via --frames-dir."""
    from weather4cast_bigdata_spark.plans.registry_weather import _fixture_lake

    raw = _fixture_lake()
    lake = str(tmp_path / "lake")
    assert main(
        [
            "ingest", "--raw-dir", f"{raw}/w4c", "--output-dir", lake,
            "--products", "CTTH=temperature;CRR=crr_intensity",
        ]
    ) == 0
    out = capsys.readouterr().out
    assert "ingested 16 frame files" in out
    back = spark.read.parquet(lake)
    # hive axes recovered as partition columns; 2 regions x 1 subset
    # x 1 day x 2 products
    assert {"region", "subset", "day", "product"} <= set(back.columns)
    assert back.select("region", "subset", "day", "product").distinct().count() == 4
    assert back.count() == 16 * 8 * 8  # every frame decodes to the 8x8 grid
    sub = str(tmp_path / "sub")
    assert main(["submit", "--frames-dir", lake, "--submission-dir", sub]) == 0
    assert "quantized cells" in capsys.readouterr().out
    assert spark.read.parquet(sub).count() > 0


def test_cli_ingest_region_filter_and_validation(spark, tmp_path, capsys):
    from weather4cast_bigdata_spark.plans.registry_weather import _fixture_lake
    import pytest

    raw = _fixture_lake()
    lake = str(tmp_path / "lake_r1")
    assert main(
        ["ingest", "--raw-dir", f"{raw}/w4c", "--output-dir", lake,
         "--regions", "R1"]
    ) == 0
    back = spark.read.parquet(lake)
    assert back.select("region").distinct().collect()[0]["region"] == "R1"
    with pytest.raises(SystemExit):
        main(["ingest", "--raw-dir", f"{raw}/w4c"])  # missing --output-dir
    with pytest.raises(SystemExit):
        main(["ingest", "--raw-dir", f"{raw}/w4c", "--output-dir", lake,
              "--grid", "bogus"])


def test_cli_submit_h5_format(spark, tmp_path, capsys):
    sub = str(tmp_path / "subh5")
    assert main(
        ["submit", "--submission-dir", sub, "--submission-format", "h5"]
    ) == 0
    out = capsys.readouterr().out
    assert "(region, day)" in out and "files under" in out
    import glob

    from weather4cast_bigdata_spark.sources import hdf5, weather_fixtures

    files = glob.glob(f"{sub}/*/test/*.np*") + glob.glob(f"{sub}/*/test/*.h5")
    assert files
    # The scorer reads channels positionally in the reference's
    # target_vars order (datasets.py:415), NOT alphabetically:
    # (temperature, crr_intensity, asii_turb_trop_prob, cma).
    # temperature/crr quantize to 16-bit (quant_hi 65535) while
    # asii/cma quantize to 8-bit (quant_hi 255), so channel maxima
    # discriminate the order: alphabetical would put asii (<=255)
    # in channel 0.
    assert weather_fixtures.TARGET_VARS == (
        "temperature", "crr_intensity", "asii_turb_trop_prob", "cma",
    )
    arr = hdf5.read_submission(files[0])
    assert arr.ndim == 4 and arr.shape[1] == 4
    assert arr[:, 0].max() > 255  # temperature, not asii
    assert arr[:, 1].max() > 255  # crr_intensity, not cma
    assert arr[:, 2].max() <= 255  # asii_turb_trop_prob
    assert arr[:, 3].max() <= 255  # cma
