"""Transcript writers: srt/vtt/tsv/json/txt formatting (openai CLI writer
conventions — comma decimals + forced hours in SRT, dot decimals in VTT,
integer-ms TSV)."""

import json

from sar_tpu.evaluation.writers import (SEGMENT_FORMATS, render, write_srt,
                                        write_tsv, write_vtt)

SEGS = [(0.0, 2.5, "hello there"), (2.5, 3661.08, "general kenobi")]


def test_srt_format():
    out = write_srt("x", segments=SEGS)
    assert "1\n00:00:00,000 --> 00:00:02,500\nhello there" in out
    assert "2\n00:00:02,500 --> 01:01:01,080\ngeneral kenobi" in out


def test_vtt_format():
    out = write_vtt("x", segments=SEGS)
    assert out.startswith("WEBVTT\n")
    assert "00:00.000 --> 00:02.500\nhello there" in out
    assert "01:01:01.080" in out          # hours appear only when nonzero


def test_tsv_format():
    out = write_tsv("x", segments=SEGS)
    lines = out.strip().split("\n")
    assert lines[0] == "start\tend\ttext"
    assert lines[1] == "0\t2500\thello there"
    assert lines[2] == "2500\t3661080\tgeneral kenobi"


def test_open_bounds_filled():
    segs = [(None, None, "lead-in"), (1.0, None, "open tail")]
    out = write_srt("x", segments=segs)
    # lead-in: start 0, end = next start (1.0); open tail end = its start
    assert "00:00:00,000 --> 00:00:01,000\nlead-in" in out
    assert "00:00:01,000 --> 00:00:01,000\nopen tail" in out


def test_json_and_txt():
    obj = json.loads(render("json", " text ", segments=SEGS,
                            words=[{"word": "hi", "start": 0.0, "end": 0.4,
                                    "probability": 0.9}]))
    assert obj["text"] == "text"
    assert len(obj["segments"]) == 2 and obj["words"][0]["word"] == "hi"
    assert render("txt", " text \n") == "text\n"
    assert set(SEGMENT_FORMATS) == {"srt", "vtt", "tsv"}
