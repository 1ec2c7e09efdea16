"""S8 hub-layout sink and S9 viewer spool sink."""

from __future__ import annotations

import json
import os

from curator_spark.sources.hub_sink import push_to_hub_layout
from curator_spark.sources.viewer_sink import ViewerSession


def test_hub_layout_shards_and_card(spark, tmp_path):
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    repo = str(tmp_path / "repo")
    manifest = push_to_hub_layout(df, repo, "user/tiny-ds")

    # hub naming contract: data/train-XXXXX-of-XXXXX.parquet
    n = manifest["n_shards"]
    assert n >= 1
    names = sorted(os.listdir(os.path.join(repo, "data")))
    assert names == [f"train-{i:05d}-of-{n:05d}.parquet" for i in range(n)]
    assert not os.path.exists(os.path.join(repo, "_tmp_write"))

    # shards round-trip to the same rows
    back = spark.read.parquet(os.path.join(repo, "data"))
    assert back.count() == 100
    assert sorted(r["v"] for r in back.collect()) == [2 * i for i in range(100)]

    # card exists, names the dataset, embeds a sample row
    card = open(manifest["card_path"], encoding="utf-8").read()
    assert "tiny-ds" in card and card.startswith("---")
    assert '"v"' in card


def test_viewer_session_lifecycle_and_events(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"resp-{i}") for i in range(20)], ["doc_id", "response"]
    ).repartition(4)
    sess = ViewerSession(str(tmp_path), metadata={"run": "t"})
    n = sess.stream_responses(df, idx_col="doc_id")
    assert n == 20

    manifest = json.load(open(os.path.join(sess.dir, "session.json")))
    assert manifest["status"] == ViewerSession.COMPLETED
    assert manifest["metadata"] == {"run": "t"}

    events = sess.read_events()
    assert len(events) == 20
    got = {e["idx"]: e["response_data"]["response"] for e in events}
    assert got == {i: f"resp-{i}" for i in range(20)}
    # idx is carried as the event key, not duplicated in the payload
    assert "doc_id" not in events[0]["response_data"]
