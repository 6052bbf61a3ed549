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
