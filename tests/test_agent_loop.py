"""M4 multi-turn agent loop: turn parity, per-row stop conditions, and
early termination, mirroring reference agent/processor.py:110-145
(partner answers the seed first; stop marker ends the conversation).

Responders are defined INSIDE the tests: cloudpickle then ships them
by value, the same way user-supplied responders reach executors from a
notebook/driver script (module-level functions would need the module
on the executor PYTHONPATH, which a test module is not)."""

from __future__ import annotations

from pyspark.sql import functions as F

from curator_spark.stages.agent import SparkAgent, run_multiturn


def _mk_responders():
    def partner_reply(history):
        # echoes the turn count; emits the stop marker once the
        # conversation (including the seed) reaches the length encoded
        # in the seed message — different rows stop at different turns.
        want = int(history[0]["content"].split(":")[1])
        if len(history) >= want:
            return f"p{len(history)} [DONE]"
        return f"p{len(history)}"

    def seeder_reply(history):
        return f"s{len(history)}"

    return seeder_reply, partner_reply


def test_multiturn_parity_and_per_row_stop(spark):
    seeder_reply, partner_reply = _mk_responders()
    seeds = spark.createDataFrame(
        [("a", "stop:1"), ("b", "stop:3"), ("c", "stop:99")],
        ["conv_id", "seed_message"],
    )
    out = run_multiturn(
        seeds,
        seeder=SparkAgent("seeder", seeder_reply),
        partner=SparkAgent("partner", partner_reply),
        max_length=6,
        checkpoint_every=2,
    )
    rows = {r["conv_id"]: r for r in out.collect()}

    # row a: seed + first partner reply hits the marker
    a = rows["a"]
    assert a["done"] and a["stopped_by"] == "partner"
    assert [m["role"] for m in a["history"]] == ["seeder", "partner"]
    assert "[DONE]" in a["history"][-1]["content"]
    assert a["turns"] == 1

    # row b: stops on the partner's second turn (history len 3 -> marker)
    b = rows["b"]
    assert b["done"] and b["stopped_by"] == "partner"
    roles = [m["role"] for m in b["history"]]
    assert roles == ["seeder", "partner", "seeder", "partner"]
    assert b["turns"] == 3

    # row c: never hits the marker; runs all max_length turns
    c = rows["c"]
    assert not c["done"] and c["stopped_by"] is None
    assert c["turns"] == 6
    # alternating roles throughout, seed first
    roles = [m["role"] for m in c["history"]]
    assert roles == ["seeder", "partner", "seeder", "partner", "seeder",
                     "partner", "seeder"]


def test_multiturn_early_exit_when_all_done(spark):
    seeder_reply, partner_reply = _mk_responders()
    seeds = spark.createDataFrame(
        [(str(i), "stop:1") for i in range(4)], ["conv_id", "seed_message"]
    )
    out = run_multiturn(
        seeds,
        seeder=SparkAgent("s", seeder_reply),
        partner=SparkAgent("p", partner_reply),
        max_length=50,
        checkpoint_every=2,
    )
    assert out.where(~F.col("done")).isEmpty()
    assert out.agg(F.max("turns")).first()[0] == 1
