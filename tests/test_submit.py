"""spark-submit packaging smoke (BASELINE.json north-rule deployment
clause: "run via spark-submit --py-files on a multi-executor cluster").
Zips the package, launches a crawl app through the REAL spark-submit
with the package delivered ONLY via --py-files (no repo on PYTHONPATH),
and asserts the crawl produces the expected seed-first ordering."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import textwrap
import zipfile

import pytest

APP = textwrap.dedent(
    """
    import json
    from wormpy_spark.session import get_spark
    from wormpy_spark.fixtures.webgen import generate_corpus
    from wormpy_spark.fixtures.spark_tables import corpus_to_spark
    from wormpy_spark.plans.crawl import CrawlConfig, run_crawl

    spark = get_spark("submit_smoke", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = generate_corpus(
        seed=11, n_hosts=1, pages_per_host=8, n_images_per_host=2
    )
    t = corpus_to_spark(spark, corpus)
    res = run_crawl(
        spark,
        t["web"],
        CrawlConfig(base_url="https://host0.test", budget=25),
        sitemaps=t["sitemaps"],
    )
    order = [(r["seq"], r["url_norm"]) for r in res.order.collect()]
    print("SUBMIT_RESULT " + json.dumps({"n": len(order), "first": order[0]}))
    """
)


def test_spark_submit_py_files(tmp_path):
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not on this box")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = str(tmp_path / "wormpy_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(repo, "wormpy_spark")
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, repo))

    app = tmp_path / "app.py"
    app.write_text(APP)

    # the package must arrive via --py-files alone: scrub PYTHONPATH and
    # run from outside the repo
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", zpath, str(app)],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        timeout=600,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [
        ln for ln in out.stdout.splitlines() if ln.startswith("SUBMIT_RESULT ")
    ][-1]
    payload = json.loads(line.split(" ", 1)[1])
    assert payload["n"] > 0
    assert payload["first"] == [0, "https://host0.test"]
