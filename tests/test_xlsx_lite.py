"""Excel surface executes in-container (VERDICT r2 item 6): fixture
writer (tests/xlsx_fixture.py) + stdlib reader (sources/xlsx_lite.py),
with the pandas engine preferred when installed."""

import pytest

from catme_etl_spark.sources import xlsx_lite
from catme_etl_spark.sources.files import read_excel, read_excel_many
from tests.xlsx_fixture import write_xlsx


@pytest.fixture()
def workbook(tmp_path):
    return write_xlsx(
        str(tmp_path / "wb.xlsx"),
        {
            "alpha": [
                ["id", "name", "score", "ok"],
                [1, "ann", 1.5, True],
                [2, "bob", 2.0, False],
                [3, "cy", None, True],
            ],
            "beta": [["k"], ["x"], ["y"]],
        },
    )


def test_sheet_names_without_row_parse(workbook):
    assert xlsx_lite.sheet_names(workbook) == ["alpha", "beta"]


def test_read_rows_types_and_gaps(workbook):
    rows = xlsx_lite.read_rows(workbook)["alpha"]
    assert rows[0] == ["id", "name", "score", "ok"]
    assert rows[1] == [1, "ann", 1.5, True]
    # None cell is absent from the XML; row width shrinks to the
    # rightmost populated cell and pandas promotion pads it back
    assert rows[3][0] == 3 and rows[3][-1] is True


def test_rows_to_pandas_dtype_inference(workbook):
    pdf = xlsx_lite.read_workbook(workbook, sheet_name="alpha")
    assert str(pdf.dtypes["id"]) == "int64"
    assert str(pdf.dtypes["score"]) == "float64"  # null forces float
    assert list(pdf["name"]) == ["ann", "bob", "cy"]


def test_read_excel_spark_bridge(spark, workbook):
    df = read_excel(spark, workbook, sheet_name="alpha")
    got = {r.id: r.name for r in df.collect()}
    assert got == {1: "ann", 2: "bob", 3: "cy"}


def test_read_excel_many_distributed(spark, tmp_path):
    paths = [
        write_xlsx(
            str(tmp_path / f"wb{i}.xlsx"),
            {"s": [["id", "v"], [i * 10 + 1, "a"], [i * 10 + 2, "b"]]},
        )
        for i in range(3)
    ]
    df = read_excel_many(spark, paths, schema="id long, v string", sheet_name=0)
    assert df.count() == 6
    assert sorted(r.id for r in df.collect()) == [1, 2, 11, 12, 21, 22]


def test_col_letter_roundtrip():
    from tests.xlsx_fixture import _col_letter

    for i in (0, 25, 26, 51, 701, 702):
        assert xlsx_lite._col_index(f"{_col_letter(i)}1") == i
