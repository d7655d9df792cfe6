"""S11/F6 parity: filename templating shapes (utils.py:121-123,
main.py:124-125,144) and logging behavior (logger.py:11-77): simple
format, JSON record keys, sensitive masking, rotating file handler."""

from __future__ import annotations

import json
import logging
from logging.handlers import RotatingFileHandler

from wormpy_spark.sources.logsink import (
    JsonLogFormatter,
    MaskingFilter,
    configure_logging,
)
from wormpy_spark.sources.sinks import (
    log_filename,
    output_dir,
    save_output,
    set_filename,
)


def test_filename_templates():
    assert set_filename("json", "20240101_120000") == "scrape_20240101_120000.json"
    assert set_filename("csv", "x") == "scrape_x.csv"
    assert log_filename("20240101_120000") == "scrape_log_20240101_120000.log"
    assert output_dir("https://HOST0.test/p/1") == "scrapes/host0.test"
    assert output_dir("https://h.test", savename="mydir") == "scrapes/mydir"


def test_save_output_shapes(tmp_path):
    p = save_output({"a": 1}, "host0.test", "scrape_x.json", "json", root=str(tmp_path))
    assert p.endswith("scrapes/host0.test/scrape_x.json")
    assert json.load(open(p)) == {"a": 1}
    p2 = save_output([["h"], ["v"]], "host0.test", "scrape_x.csv", "csv", root=str(tmp_path))
    assert open(p2).read().splitlines() == ["h", "v"]
    try:
        save_output({}, "d", "f", "xml", root=str(tmp_path))
        raise AssertionError("should reject unknown format")
    except ValueError:
        pass


def test_configure_logging_file_and_masking(tmp_path):
    logger = logging.getLogger("wormpy_spark_test_s11")
    logger.propagate = False
    logfile = str(tmp_path / "scrapes" / "host0.test" / "scrape_log_x.log")
    configure_logging(
        log_level="INFO",
        log_file=logfile,
        sensitive_patterns=["secret-token"],
        logger=logger,
    )
    assert any(isinstance(h, RotatingFileHandler) for h in logger.handlers)
    fh = [h for h in logger.handlers if isinstance(h, RotatingFileHandler)][0]
    assert fh.maxBytes == 10 * 1024 * 1024 and fh.backupCount == 5
    logger.info("starting with secret-token inside")
    for h in logger.handlers:
        h.flush()
    text = open(logfile).read()
    assert "secret-token" not in text
    assert "*" * len("secret-token") in text
    # simple format: asctime - name - level - message
    assert " - wormpy_spark_test_s11 - INFO - " in text


def test_json_formatter_record_shape():
    fmt = JsonLogFormatter()
    rec = logging.LogRecord("m", logging.WARNING, "p.py", 1, "msg %s", ("x",), None)
    out = json.loads(fmt.format(rec))
    assert set(out) == {"timestamp", "level", "module", "message"}
    assert out["level"] == "WARNING" and out["message"] == "msg x"


def test_masking_filter_replaces_every_occurrence():
    f = MaskingFilter(["pw1"])
    rec = logging.LogRecord("m", logging.INFO, "p.py", 1, "pw1 and pw1", None, None)
    f.filter(rec)
    assert rec.getMessage() == "*** and ***"
