"""Streaming parse + watermarked hourly aggregate smoke test."""

from __future__ import annotations

import json


def test_streaming_parse_and_watermarked_agg(spark, tmp_path):
    from pysyslog import ParserOptions
    from pysyslog.streaming import hourly_counts_stream, parse_stream

    src = tmp_path / "in"
    src.mkdir()
    lines = [
        "<11>Jun  1 10:00:01 h1 sshd[1]: a",
        "<11>Jun  1 10:30:02 h1 sshd[2]: b",
        "<13>Jun  1 11:00:03 h2 cron[3]: c",
        "<11>Jun  1 09:00:04 h1 sshd[4]: late but within watermark",
    ]
    with open(src / "b0.json", "w") as fh:
        for l in lines:
            fh.write(json.dumps({"raw": l}) + "\n")

    stream = spark.readStream.schema("raw string").json(str(src))
    parsed = parse_stream(
        stream, ParserOptions(now_epoch=1543622400.0)
    )
    agg = hourly_counts_stream(parsed, watermark="10 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("hourly")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (str(r["hour"]), r["facility"], r["priority"]): r["count"]
        for r in spark.sql("select * from hourly").collect()
    }
    assert rows[("2018-06-01 10:00:00", "user", "err")] == 2
    assert rows[("2018-06-01 11:00:00", "user", "notice")] == 1
    assert rows[("2018-06-01 09:00:00", "user", "err")] == 1
