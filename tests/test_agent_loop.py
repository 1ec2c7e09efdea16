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


def test_batch_responder_receives_whole_chunk(spark):
    """VERDICT r4 ask #3: `respond_batch` is invoked ONCE per Arrow
    chunk with every still-open conversation — the M2 vectorized-model
    seam. Each reply embeds the batch size the responder saw, so the
    assertion survives the executor boundary without accumulators."""

    def seeder_batch(hists):
        n = len(hists)
        return [f"s{len(h)}.n{n}" for h in hists]

    def partner_batch(hists):
        n = len(hists)
        out = []
        for h in hists:
            want = int(h[0]["content"].split(":")[1])
            marker = " [DONE]" if len(h) >= want else ""
            out.append(f"p{len(h)}.n{n}{marker}")
        return out

    seeds = spark.createDataFrame(
        [(str(i), "stop:1" if i < 2 else "stop:99") for i in range(6)],
        ["conv_id", "seed_message"],
    ).coalesce(1)  # one partition -> one Arrow chunk -> one batch call
    out = run_multiturn(
        seeds,
        seeder=SparkAgent("s", respond_batch=seeder_batch),
        partner=SparkAgent("p", respond_batch=partner_batch),
        max_length=2,
    )
    rows = {r["conv_id"]: r for r in out.collect()}

    # turn 1 (partner): all 6 conversations open -> the single call saw n=6
    assert all(".n6" in r["history"][1]["content"] for r in rows.values())
    # turn 2 (seeder): rows 0-1 stopped, so the batch held ONLY the 4
    # open conversations — finished rows were excluded, not scored
    open_rows = [r for k, r in rows.items() if int(k) >= 2]
    assert len(open_rows) == 4
    assert all(".n4" in r["history"][2]["content"] for r in open_rows)
    done_rows = [r for k, r in rows.items() if int(k) < 2]
    assert all(len(r["history"]) == 2 for r in done_rows)


def test_per_row_responder_still_works_as_batch_adapter(spark):
    """A per-row `respond` with no `respond_batch` is wrapped into the
    batch signature automatically (default adapter)."""
    seeds = spark.createDataFrame([("a", "seed")], ["conv_id", "seed_message"])
    out = run_multiturn(
        seeds,
        seeder=SparkAgent("s", lambda h: "sx"),
        partner=SparkAgent("p", lambda h: "px [DONE]"),
        max_length=4,
    )
    row = out.first()
    assert row["done"] and row["stopped_by"] == "p"


def test_agent_requires_some_responder():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        SparkAgent("x")
