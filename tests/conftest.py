import shutil

import pytest

from mysql_tracker_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=8, extra_conf={"spark.sql.shuffle.partitions": "8"})
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def tmp_table_dir(tmp_path):
    d = tmp_path / "table"
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


def normalize(df):
    """pandas compare helper: align dtypes Spark->oracle (int32/int64,
    Int64 score), stringify ts, stable key order."""
    df = df.copy()
    if "turn_idx" in df:
        df["turn_idx"] = df["turn_idx"].astype("int64")
    if "score" in df:
        df["score"] = df["score"].astype("Int64")
    if "ts" in df:
        df["ts"] = df["ts"].astype(str)
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
