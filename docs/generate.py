"""Static API documentation generator for mogptk_tpu.

The reference builds its docs site with pdoc (reference Makefile:13-40);
neither pdoc nor sphinx is available in this image, so this is a small
self-contained generator: it imports every module in the package, walks the
public surface with `inspect`, and writes a static HTML site to docs/api/
(one page per module, a package index, full signatures and docstrings,
cross-linked class methods).

Usage:  python docs/generate.py [outdir]
"""
import html
import importlib
import inspect
import os
import pkgutil
import sys


STYLE = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif; margin: 0;
       color: #1a1a2e; }
.layout { display: flex; }
nav { min-width: 230px; background: #f4f5f7; padding: 1.2em; height: 100vh;
      position: sticky; top: 0; overflow-y: auto; box-sizing: border-box; }
nav a { display: block; color: #30507a; text-decoration: none;
        padding: 2px 0; font-size: 14px; }
nav a:hover { text-decoration: underline; }
main { padding: 2em 3em; max-width: 60em; }
h1 { font-size: 1.6em; border-bottom: 2px solid #e3e6ea; padding-bottom: .3em; }
h2.obj { font-size: 1.15em; margin-top: 2em; background: #f4f5f7;
         padding: .4em .6em; border-radius: 4px; font-family: ui-monospace,
         'SF Mono', Menlo, monospace; }
h3.member { font-size: .95em; margin: 1.2em 0 .2em; font-family: ui-monospace,
            Menlo, monospace; color: #30507a; }
pre.doc { white-space: pre-wrap; background: #fbfbfc; border-left: 3px solid
          #d6dbe1; padding: .6em .9em; font-size: 13.5px; line-height: 1.45;
          font-family: inherit; margin: .3em 0 .8em; }
code.sig { color: #555; font-size: .85em; font-weight: normal; }
.kind { color: #999; font-size: .75em; margin-right: .5em;
        text-transform: uppercase; letter-spacing: .05em; }
"""


def _signature(obj):
    try:
        return html.escape(str(inspect.signature(obj)))
    except (ValueError, TypeError):
        return "(…)"


def _doc(obj):
    d = inspect.getdoc(obj)
    return "<pre class='doc'>%s</pre>" % html.escape(d) if d else ""


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


def _class_section(name, cls):
    out = ["<h2 class='obj' id='%s'><span class='kind'>class</span>%s"
           "<code class='sig'>%s</code></h2>" % (name, name, _signature(cls))]
    bases = ", ".join(b.__name__ for b in cls.__bases__ if b is not object)
    if bases:
        out.append("<p><em>Bases: %s</em></p>" % html.escape(bases))
    out.append(_doc(cls))
    for mname, m in sorted(vars(cls).items()):
        if mname.startswith("_") and mname != "__init__":
            continue
        if inspect.isfunction(m):
            out.append("<h3 class='member'>%s.%s<code class='sig'>%s</code></h3>"
                       % (name, mname, _signature(m)))
            out.append(_doc(m))
        elif isinstance(m, property):
            out.append("<h3 class='member'>%s.%s <span class='kind'>property"
                       "</span></h3>" % (name, mname))
            out.append(_doc(m.fget) if m.fget else "")
    return "\n".join(out)


def _page(title, nav_html, body):
    return ("<!doctype html><html><head><meta charset='utf-8'>"
            "<title>%s</title><style>%s</style></head><body>"
            "<div class='layout'><nav>%s</nav><main>%s</main></div>"
            "</body></html>" % (html.escape(title), STYLE, nav_html, body))


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

    os.makedirs(outdir, exist_ok=True)
    nav = ["<strong><a href='index.html'>%s</a></strong>" % package]
    for name, _ in mods:
        nav.append("<a href='%s.html'>%s</a>" % (name, name))
    nav_html = "\n".join(nav)

    for name, mod in mods:
        classes, functions = _public_members(mod)
        body = ["<h1>%s</h1>" % name, _doc(mod)]
        for fname, f in functions:
            body.append("<h2 class='obj' id='%s'><span class='kind'>def</span>"
                        "%s<code class='sig'>%s</code></h2>"
                        % (fname, fname, _signature(f)))
            body.append(_doc(f))
        for cname, cls in classes:
            body.append(_class_section(cname, cls))
        with open(os.path.join(outdir, name + ".html"), "w") as fh:
            fh.write(_page(name, nav_html, "\n".join(body)))

    index = ["<h1>%s API documentation</h1>" % package, _doc(root),
             "<ul>"]
    for name, mod in mods:
        first = (inspect.getdoc(mod) or "").split("\n")[0]
        index.append("<li><a href='%s.html'>%s</a> — %s</li>"
                     % (name, name, html.escape(first)))
    index.append("</ul>")
    with open(os.path.join(outdir, "index.html"), "w") as fh:
        fh.write(_page(package + " API", nav_html, "\n".join(index)))
    print("wrote %d module pages to %s" % (len(mods), outdir))
    return len(mods)


if __name__ == "__main__":
    generate(*(sys.argv[1:2] or ["docs/api"]))
