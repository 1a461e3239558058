"""Jupyter notebook source (sources/ipynb.py) — nbformat-4 cell
flattening + the notebook→script reassembly."""

from kusto_pre_forge_spark.sources import ipynb as N


def test_cells_roundtrip_and_script():
    cells = [
        ("markdown", "# Title\nIntro text"),
        ("code", "import os\nprint(1)"),
        ("raw", "ignored entirely"),
        ("code", "x = 2"),
    ]
    got = N.notebook_cells(N.ipynb_bytes(cells))
    assert [(c["cell_type"], c["source"]) for c in got] == cells
    assert got[0]["language"] == "python"
    assert got[1]["n_lines"] == 2
    script = N.to_script(got)
    assert script == "# # Title\n# Intro text\n\nimport os\nprint(1)\n\nx = 2"


def test_malformed_and_string_source():
    import json

    assert N.notebook_cells(b"not json") == []
    assert N.notebook_cells(b"[1, 2]") == []
    assert N.notebook_cells(b"{}") == []
    # nbformat allows source as ONE string too
    nb = json.loads(N.ipynb_bytes([("code", "a = 1\nb = 2")]))
    nb["cells"][0]["source"] = "a = 1\nb = 2"
    got = N.notebook_cells(json.dumps(nb).encode())
    assert got[0]["source"] == "a = 1\nb = 2"


def test_read_ipynb_and_scripts(spark, tmp_path):
    """Spark layer: per-cell rows (pure map plan) and the per-notebook
    script reassembly matching the pure-python to_script output."""
    nbs = {
        "a.ipynb": [("markdown", "doc"), ("code", "print('a')")],
        "b.ipynb": [("code", "x = 1"), ("raw", "drop"), ("code", "y = 2")],
    }
    for name, cells in nbs.items():
        (tmp_path / name).write_bytes(N.ipynb_bytes(cells))
    df = N.read_ipynb(spark, str(tmp_path / "*.ipynb"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "cell flatten must stay a pure map stage"
    rows = df.collect()
    by_nb = {}
    for r in rows:
        by_nb.setdefault(r._kpf_source.rsplit("/", 1)[-1], []).append(r)
    assert {k: len(v) for k, v in by_nb.items()} == {"a.ipynb": 2, "b.ipynb": 3}

    scripts = {
        r._kpf_source.rsplit("/", 1)[-1]: r.script
        for r in N.notebooks_to_scripts(df).collect()
    }
    for name, cells in nbs.items():
        want = N.to_script(N.notebook_cells(N.ipynb_bytes(cells)))
        assert scripts[name] == want, name


def test_cell_output_text_extraction():
    """stream / execute_result text-plain / error-traceback outputs
    concatenate; rich mimetypes skip; markdown cells have none."""
    import json

    nb = json.loads(N.ipynb_bytes([("code", "print('hi')"), ("markdown", "doc")]))
    nb["cells"][0]["outputs"] = [
        {"output_type": "stream", "name": "stdout", "text": ["hi\n", "there\n"]},
        {
            "output_type": "execute_result",
            "data": {"text/plain": ["42"], "image/png": "AAAA"},
            "execution_count": 1,
        },
        {"output_type": "error", "ename": "E", "evalue": "x",
         "traceback": ["Traceback", "E: x"]},
        {"output_type": "display_data", "data": {"image/png": "BBBB"}},
    ]
    cells = N.notebook_cells(json.dumps(nb).encode())
    assert cells[0]["output_text"] == "hi\nthere\n42Traceback\nE: x"
    assert cells[1]["output_text"] == ""
