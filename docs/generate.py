"""Static API documentation generator for mogptk_tpu.

The reference builds its docs site with pdoc (reference Makefile:13-40);
neither pdoc nor sphinx is available in this image, so this is a small
self-contained generator with the pdoc feature set: it imports every module
in the package, walks the public surface with `inspect`, and writes a static
HTML site to docs/api/ — one page per module, a package index, full
signatures and docstrings, per-symbol collapsible source views, cross-linked
base classes, a per-page table of contents, and a client-side symbol search
over the whole package (no server, no build deps).

Usage:  python docs/generate.py [outdir]
"""
import html
import importlib
import inspect
import json
import os
import pkgutil
import sys


STYLE = """
:root { --ink: #1a1a2e; --accent: #30507a; --panel: #f4f5f7;
        --line: #e3e6ea; }
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif; margin: 0;
       color: var(--ink); }
.layout { display: flex; }
nav { min-width: 250px; max-width: 250px; background: var(--panel);
      padding: 1.2em; height: 100vh; position: sticky; top: 0;
      overflow-y: auto; box-sizing: border-box; }
nav a { display: block; color: var(--accent); text-decoration: none;
        padding: 2px 0; font-size: 14px; }
nav a:hover { text-decoration: underline; }
nav .toc a { padding-left: 1em; font-size: 13px; color: #5a6b84; }
main { padding: 2em 3em; max-width: 60em; min-width: 0; }
h1 { font-size: 1.6em; border-bottom: 2px solid var(--line);
     padding-bottom: .3em; }
h2.obj { font-size: 1.15em; margin-top: 2em; background: var(--panel);
         padding: .4em .6em; border-radius: 4px; font-family: ui-monospace,
         'SF Mono', Menlo, monospace; }
h3.member { font-size: .95em; margin: 1.2em 0 .2em; font-family: ui-monospace,
            Menlo, monospace; color: var(--accent); }
pre.doc { white-space: pre-wrap; background: #fbfbfc; border-left: 3px solid
          #d6dbe1; padding: .6em .9em; font-size: 13.5px; line-height: 1.45;
          font-family: inherit; margin: .3em 0 .8em; }
code.sig { color: #555; font-size: .85em; font-weight: normal; }
.kind { color: #999; font-size: .75em; margin-right: .5em;
        text-transform: uppercase; letter-spacing: .05em; }
details.src { margin: .2em 0 .8em; }
details.src summary { cursor: pointer; color: #888; font-size: .8em; }
details.src pre { background: #23262e; color: #e6e8ee; padding: .8em 1em;
                  border-radius: 4px; overflow-x: auto; font-size: 12.5px;
                  line-height: 1.4; }
#search { width: 100%; box-sizing: border-box; padding: .35em .5em;
          margin-bottom: .6em; border: 1px solid #c9cfd8; border-radius: 4px;
          font-size: 13px; }
#results { margin-bottom: .8em; }
#results a { font-size: 13px; }
#results .where { color: #999; font-size: 11px; }
em.bases a { color: var(--accent); }
"""

SEARCH_JS = """
const idx = JSON.parse(document.getElementById('symbols').textContent);
const box = document.getElementById('search');
const out = document.getElementById('results');
box.addEventListener('input', () => {
  const q = box.value.trim().toLowerCase();
  out.innerHTML = '';
  if (!q) return;
  const hits = idx.filter(s => s.n.toLowerCase().includes(q)).slice(0, 25);
  for (const s of hits) {
    const a = document.createElement('a');
    a.href = s.p + '.html' + (s.a ? '#' + s.a : '');
    a.innerHTML = s.n + " <span class='where'>" + s.p + "</span>";
    out.appendChild(a);
  }
});
"""


def _signature(obj):
    try:
        return html.escape(str(inspect.signature(obj)))
    except (ValueError, TypeError):
        return "(…)"


def _doc(obj):
    d = inspect.getdoc(obj)
    return "<pre class='doc'>%s</pre>" % html.escape(d) if d else ""


def _source(obj):
    """Collapsible source block, pdoc-style (empty string if unavailable)."""
    try:
        src = inspect.getsource(obj)
        _, line = inspect.getsourcelines(obj)
    except (OSError, TypeError):
        return ""
    mod = getattr(obj, "__module__", "") or ""
    where = "%s:%d" % (mod.replace(".", "/") + ".py", line)
    return ("<details class='src'><summary>source — %s</summary>"
            "<pre>%s</pre></details>" % (html.escape(where),
                                         html.escape(src)))


def _public_members(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    classes, functions = [], []
    for n in names:
        obj = getattr(mod, n, None)
        if inspect.isclass(obj) and obj.__module__ == mod.__name__:
            classes.append((n, obj))
        elif (inspect.isfunction(obj) or inspect.isbuiltin(obj)) and \
                getattr(obj, "__module__", None) == mod.__name__:
            functions.append((n, obj))
    return classes, functions


def _base_link(base, class_pages):
    """Link a base class to the page that documents it, when we have one."""
    key = "%s.%s" % (base.__module__, base.__name__)
    page = class_pages.get(key)
    if page:
        return "<a href='%s.html#%s'>%s</a>" % (page, base.__name__,
                                                base.__name__)
    return html.escape(base.__name__)


def _class_section(name, cls, class_pages):
    out = ["<h2 class='obj' id='%s'><span class='kind'>class</span>%s"
           "<code class='sig'>%s</code></h2>" % (name, name, _signature(cls))]
    bases = ", ".join(_base_link(b, class_pages) for b in cls.__bases__
                      if b is not object)
    if bases:
        out.append("<p><em class='bases'>Bases: %s</em></p>" % bases)
    out.append(_doc(cls))
    out.append(_source(cls))
    for mname, m in sorted(vars(cls).items()):
        if mname.startswith("_") and mname != "__init__":
            continue
        anchor = "%s.%s" % (name, mname)
        if inspect.isfunction(m):
            out.append("<h3 class='member' id='%s'>%s.%s"
                       "<code class='sig'>%s</code></h3>"
                       % (anchor, name, mname, _signature(m)))
            out.append(_doc(m))
            out.append(_source(m))
        elif isinstance(m, property):
            out.append("<h3 class='member' id='%s'>%s.%s <span class='kind'>"
                       "property</span></h3>" % (anchor, name, mname))
            out.append(_doc(m.fget) if m.fget else "")
    return "\n".join(out)


def _page(title, nav_html, body, symbols_json):
    return ("<!doctype html><html><head><meta charset='utf-8'>"
            "<title>%s</title><style>%s</style></head><body>"
            "<div class='layout'><nav>"
            "<input id='search' type='search' placeholder='Search symbols…'>"
            "<div id='results'></div>%s</nav><main>%s</main></div>"
            "<script type='application/json' id='symbols'>%s</script>"
            "<script>%s</script></body></html>"
            % (html.escape(title), STYLE, nav_html, body,
               symbols_json, SEARCH_JS))


def generate(outdir="docs/api", package="mogptk_tpu"):
    sys.path.insert(0, os.getcwd())
    root = importlib.import_module(package)
    modnames = [package]
    for m in pkgutil.walk_packages(root.__path__, prefix=package + "."):
        base = m.name.rsplit(".", 1)[-1]
        if not base.startswith("_"):
            modnames.append(m.name)
    mods = []
    for name in sorted(modnames):
        try:
            mods.append((name, importlib.import_module(name)))
        except Exception as e:  # document what imports; report the rest
            print("skip %s: %r" % (name, e), file=sys.stderr)

    # pass 1: symbol index (search + base-class cross-links)
    class_pages = {}   # "defining_module.ClassName" -> page module name
    symbols = []       # [{n: display, p: page, a: anchor}]
    members = {}       # page -> [(kind, name, obj)]
    for name, mod in mods:
        classes, functions = _public_members(mod)
        members[name] = (classes, functions)
        symbols.append({"n": name, "p": name, "a": ""})
        for fname, _ in functions:
            symbols.append({"n": fname + "()", "p": name, "a": fname})
        for cname, cls in classes:
            class_pages["%s.%s" % (cls.__module__, cls.__name__)] = name
            symbols.append({"n": cname, "p": name, "a": cname})
            for mname, m in sorted(vars(cls).items()):
                if mname.startswith("_") or not inspect.isfunction(m):
                    continue
                symbols.append({"n": "%s.%s()" % (cname, mname), "p": name,
                                "a": "%s.%s" % (cname, mname)})
    symbols_json = json.dumps(symbols, separators=(",", ":"))

    os.makedirs(outdir, exist_ok=True)
    nav = ["<strong><a href='index.html'>%s</a></strong>" % package,
           "<a href='guide.html'>User guide</a>",
           "<a href='examples.html'>Examples</a>"]
    for name, _ in mods:
        nav.append("<a href='%s.html'>%s</a>" % (name, name))
    nav_html = "\n".join(nav)

    # pass 2: pages
    for name, mod in mods:
        classes, functions = members[name]
        toc = ["<div class='toc'>"]
        for fname, _ in functions:
            toc.append("<a href='#%s'>%s()</a>" % (fname, fname))
        for cname, _ in classes:
            toc.append("<a href='#%s'>%s</a>" % (cname, cname))
        toc.append("</div>")
        page_nav = nav_html
        if functions or classes:
            page_nav += ("\n<hr style='border:none;border-top:1px solid "
                         "#d6dbe1'><strong style='font-size:13px'>%s</strong>"
                         "\n" % name.rsplit(".", 1)[-1]) + "\n".join(toc)
        body = ["<h1>%s</h1>" % name, _doc(mod)]
        for fname, f in functions:
            body.append("<h2 class='obj' id='%s'><span class='kind'>def</span>"
                        "%s<code class='sig'>%s</code></h2>"
                        % (fname, fname, _signature(f)))
            body.append(_doc(f))
            body.append(_source(f))
        for cname, cls in classes:
            body.append(_class_section(cname, cls, class_pages))
        with open(os.path.join(outdir, name + ".html"), "w") as fh:
            fh.write(_page(name, page_nav, "\n".join(body), symbols_json))

    n_examples = _render_examples(outdir, nav_html, symbols_json)
    _render_guide(outdir, nav_html, symbols_json)

    index = ["<h1>%s documentation</h1>" % package, _doc(root),
             "<p><a href='guide.html'><strong>User guide</strong></a> — "
             "installation, device/precision selection, training advice, "
             "the exact/iterative/sparse decision tree, multi-chip meshes."
             "</p>",
             "<p><a href='examples.html'><strong>Examples</strong></a> — "
             "%d tutorial and case-study notebooks.</p>" % n_examples,
             "<h2>API reference</h2>", "<ul>"]
    for name, mod in mods:
        first = (inspect.getdoc(mod) or "").split("\n")[0]
        index.append("<li><a href='%s.html'>%s</a> — %s</li>"
                     % (name, name, html.escape(first)))
    index.append("</ul>")
    with open(os.path.join(outdir, "index.html"), "w") as fh:
        fh.write(_page(package + " API", nav_html, "\n".join(index),
                       symbols_json))
    print("wrote %d module pages + guide + %d example pages to %s"
          % (len(mods), n_examples, outdir))
    return len(mods)


def _render_guide(outdir, nav_html, symbols_json):
    """Render docs/guide.md into the site (the reference renders its
    mogptk/documentation.md the same way, reference Makefile:13-40)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "guide.md")
    try:
        import markdown
    except ImportError:
        # degrade like _render_examples does without nbconvert: ship the
        # raw markdown in a <pre> page instead of failing doc generation
        with open(path) as fh:
            import html as _html
            body = "<pre>%s</pre>" % _html.escape(fh.read())
        with open(os.path.join(outdir, "guide.html"), "w") as fh:
            fh.write(_page("mogptk_tpu user guide", nav_html, body,
                           symbols_json))
        return
    with open(path) as fh:
        body = markdown.markdown(fh.read(), extensions=["fenced_code",
                                                        "tables"])
    with open(os.path.join(outdir, "guide.html"), "w") as fh:
        fh.write(_page("mogptk_tpu user guide", nav_html, body,
                       symbols_json))


def _render_examples(outdir, nav_html, symbols_json):
    """Convert examples/notebooks/*.ipynb to HTML pages and an index
    (parity with the reference's nbconvert docs flow, Makefile:13-40)."""
    nbdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "notebooks")
    notebooks = sorted(f for f in os.listdir(nbdir) if f.endswith(".ipynb"))
    exdir = os.path.join(outdir, "examples")
    os.makedirs(exdir, exist_ok=True)
    items = []
    try:
        import nbformat
        from nbconvert import HTMLExporter
        exporter = HTMLExporter()
        have_nbconvert = True
    except Exception:
        have_nbconvert = False
    for fname in notebooks:
        title = fname[:-6]
        if have_nbconvert:
            nb = nbformat.read(os.path.join(nbdir, fname), as_version=4)
            body, _ = exporter.from_notebook_node(nb)
            with open(os.path.join(exdir, title + ".html"), "w") as fh:
                fh.write(body)
            items.append("<li><a href='examples/%s.html'>%s</a></li>"
                         % (title, title))
        else:
            items.append("<li>%s (install nbconvert to render)</li>" % title)
    body = ["<h1>Examples</h1>",
            "<p>Every notebook also exists as a plain script under "
            "<code>examples/</code>, and every script runs as a test "
            "(<code>tests/test_examples.py</code>).</p>", "<ul>"]
    body += items + ["</ul>"]
    with open(os.path.join(outdir, "examples.html"), "w") as fh:
        fh.write(_page("mogptk_tpu examples", nav_html, "\n".join(body),
                       symbols_json))
    return len(notebooks)


if __name__ == "__main__":
    generate(*(sys.argv[1:2] or ["docs/api"]))
