"""Golden tests for the reference-parity car pipeline (FIXTURES.md §2):
hand-computable fixtures pin the cleaning / feature / join semantics
to the reference's behavior (file:line cites in the library docstrings).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mathorcup_spark.functions import cars
from mathorcup_spark.sources import tsv


@pytest.fixture(scope="module")
def valuation(spark):
    rows = [
        # carid, tradeTime, carCode, gearbox, anonymousFeature12, anonymousFeature13, price
        Row(carid=1, tradeTime="2021-03-15", carCode=7, gearbox=1.0,
            anonymousFeature12="4500*1800*1500", anonymousFeature13="200710", price=12.3),
        Row(carid=2, tradeTime="2020-12-01", carCode=None, gearbox=None,
            anonymousFeature12=None, anonymousFeature13=None, price=8.0),
        Row(carid=3, tradeTime="2019-06-30", carCode=9, gearbox=2.0,
            anonymousFeature12="0*0*0", anonymousFeature13="201512", price=5.5),
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def transactions(spark):
    rows = [
        Row(carid=1, pushDate="2021-01-01", pushPrice=10.0,
            updatePriceTimeJson='{"2021-01-10": "9.5", "2021-02-01": "9.0"}',
            pullDate="2021-02-15", withdrawDate="2021-02-10"),
        Row(carid=2, pushDate="2021-01-05", pushPrice=7.5,
            updatePriceTimeJson="{}", pullDate=None, withdrawDate=None),
        Row(carid=99, pushDate="2021-01-07", pushPrice=3.0,
            updatePriceTimeJson=None, pullDate="2021-03-01", withdrawDate=None),
    ]
    return spark.createDataFrame(rows)


def test_fix_valuation_constants(valuation):
    out = cars.fix_valuation(valuation)
    r2 = {r["carid"]: r for r in out.collect()}[2]
    assert r2["carCode"] == -1            # src/utils.py:101
    assert r2["gearbox"] == 0             # src/utils.py:109
    assert r2["anonymousFeature12"] == "0*0*0"   # src/utils.py:130
    assert r2["anonymousFeature13"] == "200001"  # src/utils.py:125
    # non-null rows untouched
    r1 = {r["carid"]: r for r in out.collect()}[1]
    assert r1["carCode"] == 7 and r1["anonymousFeature12"] == "4500*1800*1500"


def test_derive_geometry(valuation):
    out = cars.derive_geometry(cars.fix_valuation(valuation))
    rows = {r["carid"]: r for r in out.collect()}
    r1 = rows[1]
    assert (r1["dim_length"], r1["dim_width"], r1["dim_height"]) == (4500, 1800, 1500)
    assert r1["dim_volume"] == 4500 * 1800 * 1500
    assert r1["dim_surface"] == 4 * (4500 * 1800 + 4500 * 1500 + 1800 * 1500)
    assert r1["dim_perimeter"] == 4 * (4500 + 1800 + 1500)
    assert rows[3]["dim_volume"] == 0.0   # the 0*0*0 imputed case
    assert rows[2]["dim_volume"] == 0.0   # null → filled to 0*0*0 first


def test_parse_dates(valuation):
    out = cars.parse_dates(cars.fix_valuation(valuation))
    rows = {r["carid"]: r for r in out.collect()}
    assert rows[1]["trade_y"] == 21 and rows[1]["trade_m"] == 2 and rows[1]["trade_d"] == 14
    assert str(rows[1]["anonymousFeature13_d"]) == "2007-10-01"  # src/data.py:18
    assert str(rows[2]["anonymousFeature13_d"]) == "2000-01-01"  # imputed sentinel


def test_extract_deal_price(transactions):
    out = {r["carid"]: r for r in cars.extract_deal_price(transactions).collect()}
    assert out[1]["dealPrice"] == 9.0    # value at max adjustment date
    assert out[2]["dealPrice"] == 7.5    # empty map → pushPrice fallback
    assert out[99]["dealPrice"] == 3.0   # null map → pushPrice fallback


def test_sold_indicator_and_join(valuation, transactions):
    joined = cars.join_transactions(cars.fix_valuation(valuation),
                                    cars.sold_indicator(transactions))
    rows = {r["carid"]: r for r in joined.collect()}
    assert set(rows) == {1, 2}           # carid 99 has no valuation row (inner)
    assert rows[1]["sold"] == 1 and rows[2]["sold"] == 0  # src/utils.py:245-250
    sold_only = cars.join_transactions(valuation, transactions, sold_only=True)
    assert [r["carid"] for r in sold_only.collect()] == [1]


def test_holding_days(transactions):
    out = {r["carid"]: r for r in cars.holding_days(transactions).collect()}
    assert out[1]["holdingDays"] == 40   # 2021-01-01 → 2021-02-10 (deal wins)
    assert out[99]["holdingDays"] == 53  # pull date fallback
    assert out[2]["holdingDays"] is None


def test_split_dataset_deterministic(valuation, spark):
    big = spark.range(1000).withColumn("x", F.rand(7))
    t1, d1 = cars.split_dataset(big, seed=42)
    t2, d2 = cars.split_dataset(big, seed=42)
    assert t1.count() + d1.count() == 1000
    assert t1.count() == t2.count()
    assert sorted(r["id"] for r in t1.collect()) == sorted(r["id"] for r in t2.collect())
    assert 600 < t1.count() < 800        # ~70%


def test_build_dictionary_and_encode(valuation):
    d = cars.build_dictionary([valuation], columns=["carCode", "gearbox"])
    rows = d.collect()
    # dense 0-based ids ordered by (name, value)
    assert [r["token_id"] for r in sorted(rows, key=lambda r: r["token_id"])] == list(
        range(len(rows))
    )
    names = {r["name"] for r in rows}
    assert names == {"carCode", "gearbox"}
    enc = cars.encode_columns(valuation, d, ["carCode"])
    got = {r["carid"]: r["carCode_id"] for r in enc.collect()}
    tok = {(r["name"], r["value"]): r["token_id"] for r in rows}
    assert got[1] == tok[("carCode", "7")]
    assert got[2] is None                # null never matches (reference KeyErrors)


def test_ragged_tsv_roundtrip(spark, tmp_path):
    p = tmp_path / "trans.tsv"
    p.write_text(
        "1\t2021-01-01\t10.0\t{}\t2021-02-15\t2021-02-10\n"
        "2\t2021-01-05\t7.5\t{}\t2021-03-01\n"  # 5-field ragged row
    )
    df = tsv.read_ragged_tsv(
        spark, str(p), cars.TRANSACTION_COLUMNS, min_fields=5
    )
    rows = {r["carid"]: r for r in df.collect()}
    assert rows["2"]["withdrawDate"] is None      # padded
    assert rows["1"]["withdrawDate"] == "2021-02-10"


def test_ragged_tsv_rejects_malformed(spark, tmp_path):
    p = tmp_path / "bad.tsv"
    p.write_text("1\t2\n")  # too few fields
    df = tsv.read_ragged_tsv(spark, str(p), cars.TRANSACTION_COLUMNS, min_fields=5)
    with pytest.raises(Exception, match="malformed TSV row"):
        df.collect()


def test_read_tsv_positional_names(spark, tmp_path):
    p = tmp_path / "val.tsv"
    p.write_text("1\tred\n2\tblue\n")
    df = tsv.read_tsv(spark, str(p), ["id", "color"])
    assert df.columns == ["id", "color"]
    assert {r["color"] for r in df.collect()} == {"red", "blue"}
