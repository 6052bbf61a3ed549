"""Generate Jupyter notebooks from the example scripts.

The reference distributes its tutorials as .ipynb files
(/root/reference/examples/*.ipynb); this repo's examples are plain
scripts (runnable, CI-gated by tests/test_examples.py). This generator
produces the notebook format from the same sources so notebook users get
the familiar artifact without maintaining two copies:

- the module docstring becomes the title markdown cell,
- top-level `# --- ...` / standalone comment blocks that follow a blank
  line start a new cell, with the comment lifted into a markdown cell,
- everything else stays verbatim code.

Usage:  python docs/make_notebooks.py [outdir]   (default examples/notebooks)
"""
import ast
import json
import os
import re
import sys


def _md_cell(text):
    lines = text.strip("\n").split("\n")
    return {"cell_type": "markdown", "metadata": {},
            "source": [l + "\n" for l in lines[:-1]] + [lines[-1]]}


def _code_cell(text):
    lines = text.strip("\n").split("\n")
    return {"cell_type": "code", "metadata": {}, "execution_count": None,
            "outputs": [],
            "source": [l + "\n" for l in lines[:-1]] + [lines[-1]]}


def script_to_notebook(path):
    src = open(path).read()
    tree = ast.parse(src)
    doc = ast.get_docstring(tree) or os.path.basename(path)
    body = src.split('"""', 2)[2].lstrip("\n") if '"""' in src else src

    title = doc.split("\n")[0].rstrip(".")
    rest = "\n".join(doc.split("\n")[1:]).strip()
    cells = [_md_cell("# %s\n\n%s" % (title, rest) if rest else "# " + title)]

    # split the body at blank-line-separated comment blocks: the comment
    # becomes markdown, the code until the next such block a code cell
    chunks = re.split(r"\n\n(?=#)", body)
    for chunk in chunks:
        lines = chunk.split("\n")
        md = []
        while lines and lines[0].startswith("#"):
            md.append(lines.pop(0).lstrip("# ").rstrip())
        if md:
            cells.append(_md_cell("\n".join(md)))
        code = "\n".join(lines).strip("\n")
        if code:
            cells.append(_code_cell(code))

    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        here, "examples", "notebooks")
    os.makedirs(outdir, exist_ok=True)
    examples = sorted(f for f in os.listdir(os.path.join(here, "examples"))
                      if f.endswith(".py"))
    for fname in examples:
        nb = script_to_notebook(os.path.join(here, "examples", fname))
        out = os.path.join(outdir, fname[:-3] + ".ipynb")
        with open(out, "w") as f:
            json.dump(nb, f, indent=1)
        print("wrote", out)


if __name__ == "__main__":
    main()
