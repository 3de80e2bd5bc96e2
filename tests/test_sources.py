"""Source readers + parsing tools (1->N row expansion, gated imports)."""

import pytest

from docetl_spark.sources import parsers, readers


@pytest.fixture()
def text_dir(tmp_path):
    (tmp_path / "a.txt").write_text("alpha doc")
    (tmp_path / "b.txt").write_text("beta doc\nsecond line")
    return str(tmp_path)


def test_read_dir_and_txt_parser(spark, text_dir):
    df = readers.read_dir(spark, text_dir)
    assert df.count() == 2
    parsed = readers.apply_parser(df, parsers.txt_to_string, {"text": "str"})
    texts = sorted(r["text"] for r in parsed.select("text").collect())
    assert texts == ["alpha doc", "beta doc\nsecond line"]


def test_parser_one_to_many(spark, text_dir):
    df = readers.read_dir(spark, text_dir)

    def per_line(row):
        return [{"line": ln} for ln in row["text"].splitlines()]

    parsed = readers.apply_parser(df, per_line, {"line": "str"})
    assert parsed.count() == 3  # 1 + 2 lines


def test_custom_parser_from_source(spark, text_dir):
    src = "def parse(row):\n    return [{'n_chars': len(row['text'])}]"
    fn = parsers.custom_parser(src)
    df = readers.read_dir(spark, text_dir)
    out = readers.apply_parser(df, fn, {"n_chars": "int"})
    assert sorted(r["n_chars"] for r in out.collect()) == [9, 20]


def test_gated_parser_raises_clearly(spark):
    with pytest.raises(RuntimeError, match="fitz|pdf_to_string"):
        parsers.pdf_to_string({"path": "/nonexistent.pdf"})


def test_json_csv_roundtrip(spark, tmp_path):
    rows = [{"id": 1, "t": "x"}, {"id": 2, "t": "y"}]
    df = readers.from_list(spark, rows)
    readers.write_output(df, str(tmp_path / "out.json"))
    back = readers.read_json(spark, str(tmp_path / "out.json"), multiline=False)
    assert back.count() == 2
    readers.write_output(df, str(tmp_path / "out.csv"))
    back_csv = readers.read_csv(spark, str(tmp_path / "out.csv"))
    assert back_csv.count() == 2
