"""The API docs generator (docs/generate.py) must import every package
module and emit a complete static site (the analog of the reference's pdoc
build, reference Makefile:13-40)."""
import os
import sys


def test_docs_generate(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "docs"))
    import generate

    outdir = str(tmp_path / "api")
    n = generate.generate(outdir=outdir)
    assert n >= 30, "expected the full module tree, got %d pages" % n
    assert os.path.exists(os.path.join(outdir, "index.html"))

    # key public symbols land on their module pages with docstrings
    cfg = open(os.path.join(outdir, "mogptk_tpu.gpr.config.html")).read()
    assert "use_blocked_cholesky" in cfg and "use_pallas" in cfg
    model = open(os.path.join(outdir, "mogptk_tpu.model.html")).read()
    assert "LoadModel" in model
    gprm = open(os.path.join(outdir, "mogptk_tpu.gpr.model.html")).read()
    assert "log_marginal_likelihood" in gprm and "class" in gprm
    index = open(os.path.join(outdir, "index.html")).read()
    assert "mogptk_tpu.models.mosm" in index


def test_notebook_generation(tmp_path):
    """docs/make_notebooks.py converts every example script into a valid
    nbformat-4 notebook whose code cells parse (the notebook-format
    distribution matching the reference's examples/*.ipynb)."""
    import ast
    import json
    import subprocess

    here = os.path.join(os.path.dirname(__file__), "..")
    outdir = str(tmp_path / "nb")
    subprocess.run([sys.executable,
                    os.path.join(here, "docs", "make_notebooks.py"), outdir],
                   check=True)
    examples = [f for f in os.listdir(os.path.join(here, "examples"))
                if f.endswith(".py")]
    made = [f for f in os.listdir(outdir) if f.endswith(".ipynb")]
    assert len(made) == len(examples) >= 11
    for f in made:
        nb = json.load(open(os.path.join(outdir, f)))
        assert nb["nbformat"] == 4
        assert nb["cells"][0]["cell_type"] == "markdown"
        assert any(c["cell_type"] == "code" for c in nb["cells"])
        for c in nb["cells"]:
            if c["cell_type"] == "code":
                ast.parse("".join(c["source"]))
