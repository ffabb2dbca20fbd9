"""Build a REAL-text web corpus from installed-package documentation.

The dev box has zero network egress, so "real pages" cannot come from the
live web.  The nearest on-disk source of genuine human-written English
prose at corpus scale is the documentation embedded in installed Python
packages: module/class/function docstrings (numpy, scipy, jax, torch,
pandas, sklearn, transformers, ... — ~14k modules, ~90 MB of prose) plus
dist-info METADATA long descriptions.  This tool turns them into a real
*website*: one HTML page per module, titled and interlinked along the
package hierarchy (parent/child/sibling links), with a root index, a
robots.txt carrying a disallowed section, and a /private/ subtree to
exercise robots handling — so the actual crawler does an actual crawl
(tools/real_run.py drives crawl -> merge -> build -> serve -> batch eval).

Nothing here is synthetic: every sentence was written by a human for
humans (VERDICT r2 "real-text end-to-end validation").

Also exports (query, passage) pairs for encoder training (VERDICT r2 #5):
a docstring's summary line is a natural short query for its body — the
title->body pair construction the reference's GooAQ setup mirrors
(question -> answer passage, reference embedder_training/train.py:40-60).

Usage:
    python tools/make_real_corpus.py --out /tmp/real_site [--max-docs N]
    python tools/make_real_corpus.py --pairs /tmp/pairs.tsv --min-pairs 100000
"""

from __future__ import annotations

import argparse
import ast
import hashlib
import html
import json
import os
import re
import sys
from typing import Dict, Iterator, List, Optional, Tuple

def _dedup_roots(paths):
    # lib64 is a symlink to lib on this image: dedup by REALPATH or every
    # document (and training pair) is emitted twice
    seen, out = set(), []
    for p in paths:
        if not os.path.isdir(p):
            continue
        rp = os.path.realpath(p)
        if rp in seen:
            continue
        seen.add(rp)
        out.append(rp)
    return out


SITE_PACKAGES = _dedup_roots(
    [
        "/opt/venv/lib/python3.12/site-packages",
        *[p for p in sys.path if p.endswith("site-packages")],
    ]
)

SKIP_DIRS = {"__pycache__", "tests", "test", "testing", "_vendor", "vendored"}

_WS = re.compile(r"[ \t]+")
_RST_DIRECTIVE = re.compile(r"^\s*\.\. [a-z-]+::.*$", re.M)


def clean_prose(doc: str) -> str:
    """Light cleanup of docstring markup: drop rst directive lines and
    squeeze whitespace; keep the prose itself untouched."""
    doc = _RST_DIRECTIVE.sub("", doc)
    lines = [_WS.sub(" ", ln.rstrip()) for ln in doc.splitlines()]
    return "\n".join(lines).strip()


def iter_module_docs(
    min_chars: int = 300,
    min_doc_chars: int = 100,
    roots: Optional[List[str]] = None,
) -> Iterator[dict]:
    """Yield one record per module whose docstrings total >= min_chars:
    {module, package, title, text, sections:[(name, doc), ...]}."""
    for root in roots or SITE_PACKAGES:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = sorted(
                d for d in dirnames if d not in SKIP_DIRS
            )
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                path = os.path.join(dirpath, fn)
                rel = os.path.relpath(path, root)
                mod = rel[:-3].replace(os.sep, ".")
                if mod.endswith(".__init__"):
                    mod = mod[: -len(".__init__")]
                if any(seg.startswith("_") and seg != "__init__"
                       for seg in mod.split(".")):
                    continue
                try:
                    src = open(path, encoding="utf-8", errors="ignore").read()
                    tree = ast.parse(src)
                except (SyntaxError, ValueError, OSError):
                    continue
                sections: List[Tuple[str, str]] = []
                mdoc = ast.get_docstring(tree)
                if mdoc and len(mdoc) >= min_doc_chars:
                    sections.append((mod, clean_prose(mdoc)))
                for node in ast.walk(tree):
                    if isinstance(
                        node,
                        (ast.ClassDef, ast.FunctionDef, ast.AsyncFunctionDef),
                    ):
                        d = ast.get_docstring(node)
                        if d and len(d) >= min_doc_chars:
                            sections.append((node.name, clean_prose(d)))
                total = sum(len(d) for _, d in sections)
                if total < min_chars:
                    continue
                yield {
                    "module": mod,
                    "package": mod.split(".")[0],
                    "title": f"{mod} — API documentation",
                    "sections": sections,
                    "chars": total,
                }


_SENT_SPLIT = re.compile(r"(?<=[.!?]) +")
_TOKEN = re.compile(r"[A-Za-z_][A-Za-z0-9_]{5,}")

# deterministic question templates for name->doc pairs (VERDICT r3 #4:
# query-style augmentation — human queries are questions, docstring heads
# are imperatives; picked per-name by a stable hash so reruns reproduce)
_Q_TEMPLATES = (
    "how do I use {name}",
    "what does {name} do",
    "{name} example usage",
    "how does {name} work",
)


def iter_pairs(
    min_doc_chars: int = 100,
    roots: Optional[List[str]] = None,
    rich: bool = False,
) -> Iterator[Tuple[str, str]]:
    """(query, passage) pairs: summary line -> docstring body (only when
    the body continues past the summary — otherwise there is nothing to
    retrieve).  Exact (query, passage) duplicates are dropped.

    ``rich=False`` reproduces the round-3 mining byte-for-byte (the
    committed flagship's training file).  ``rich=True`` adds four more
    pair constructions from the SAME corpus (VERDICT r3 #4: scale the
    pair count toward the reference's 1.5M GooAQ pairs without egress —
    reference recipe: /root/reference/embedder_training/train.py:40-60):

      * full ICT — EVERY sentence (not just the first) of a long
        paragraph queries the paragraph with that sentence removed;
      * question-style queries — "how do I use X" etc. -> section doc
        (the GooAQ analog: question -> answering passage);
      * keyword queries — the section's rare identifiers as a terse
        2-4 token query (how people actually search);
      * title pairs — "module — name" -> section body (title -> body).
    """
    seen = set()
    for rec in iter_module_docs(
        min_chars=min_doc_chars, min_doc_chars=min_doc_chars, roots=roots
    ):
        for name, doc in rec["sections"]:
            parts = doc.split("\n", 1)
            head = parts[0].strip().rstrip(".")
            body = parts[1].strip() if len(parts) > 1 else ""
            if len(head) < 12 or len(head) > 200 or len(body) < 50:
                continue
            passage = _WS.sub(" ", body.replace("\n", " "))[:2000]
            key = hash((head, passage))
            if key in seen:
                continue
            seen.add(key)
            yield head, passage
            if rich:
                # question-style name queries (two stable picks per name)
                h = int(hashlib.md5(name.encode()).hexdigest()[:8], 16)
                for t in (
                    _Q_TEMPLATES[h % 4], _Q_TEMPLATES[(h + 1) % 4]
                ):
                    q = t.format(name=name)
                    k3 = hash((q, passage))
                    if k3 not in seen:
                        seen.add(k3)
                        yield q, passage
                # title -> body
                q = f"{rec['module']} {name}"
                k4 = hash((q, passage))
                if k4 not in seen and name != rec["module"]:
                    seen.add(k4)
                    yield q, passage
                # keyword query: 3 rarest-looking identifiers, stable order
                toks = list(dict.fromkeys(_TOKEN.findall(body)))
                if len(toks) >= 3:
                    toks.sort(
                        key=lambda t: int(
                            hashlib.md5(t.encode()).hexdigest()[:6], 16
                        )
                    )
                    q = " ".join(toks[:3]).lower()
                    k5 = hash((q, passage))
                    if k5 not in seen:
                        seen.add(k5)
                        yield q, passage
            # ICT pairs (inverse cloze task, the standard retrieval
            # pre-training construction): a paragraph's leading sentence
            # is a pseudo-query for the REST of its paragraph.  Real
            # sentences, real contexts; multiplies pair volume ~2x.
            for para in body.split("\n\n"):
                para = _WS.sub(" ", para.replace("\n", " ")).strip()
                if len(para) < 170:
                    continue
                sent, _, rest = para.partition(". ")
                rest = rest.strip()
                if len(sent) < 20 or len(sent) > 200 or len(rest) < 80:
                    continue
                k2 = hash((sent, rest))
                if k2 in seen:
                    continue
                seen.add(k2)
                yield sent, rest[:2000]
                if rich:
                    # full ICT: every other sentence queries the paragraph
                    # with itself removed (cap 8/paragraph)
                    sents = _SENT_SPLIT.split(para)
                    for s in sents[1:9]:
                        s = s.strip()
                        if len(s) < 20 or len(s) > 200:
                            continue
                        ctx = para.replace(s, " ", 1).strip()
                        if len(ctx) < 80:
                            continue
                        k6 = hash((s, ctx))
                        if k6 in seen:
                            continue
                        seen.add(k6)
                        yield s, ctx[:2000]


# ---------------------------------------------------------------------------
# site generation
# ---------------------------------------------------------------------------


def page_path(mod: str, private: bool) -> str:
    base = f"/{mod.replace('.', '/')}.html"
    return f"/private{base}" if private else base


def render_page(
    rec: dict, links: List[Tuple[str, str]], base: str = ""
) -> str:
    body = []
    for name, doc in rec["sections"]:
        body.append(f"<h2>{html.escape(name)}</h2>")
        for para in doc.split("\n\n"):
            para = para.strip()
            if para:
                body.append(f"<p>{html.escape(para)}</p>")
    anchors = "".join(
        f'<li><a href="{base}{href}">{html.escape(text)}</a></li>'
        for href, text in links
    )
    return (
        "<html><head><title>"
        + html.escape(rec["title"])
        + "</title></head><body><main><h1>"
        + html.escape(rec["title"])
        + "</h1>"
        + "".join(body)
        + f"</main><nav><ul>{anchors}</ul></nav></body></html>"
    )


def _split_sections(rec: dict, taken: set) -> List[dict]:
    """Section-granularity page records for one module: the module hub
    keeps the module docstring; every class/function docstring becomes its
    own page (Sphinx-autodoc style, one page per API object) named
    ``<module>.<object>``.  Collisions with real submodule names or
    repeated object names get a numeric suffix."""
    mod = rec["module"]
    own = [(n, d) for n, d in rec["sections"] if n == mod]
    others = [(n, d) for n, d in rec["sections"] if n != mod]
    out = []
    if own or not others:
        out.append(dict(rec, sections=own or rec["sections"]))
    for n, d in others:
        name = f"{mod}.{n}"
        i = 2
        while name in taken:
            name = f"{mod}.{n}.{i}"
            i += 1
        taken.add(name)
        out.append(
            {
                "module": name,
                "package": rec["package"],
                "title": f"{name} — API documentation",
                "sections": [(n, d)],
                "chars": len(d),
            }
        )
    return out


def build_site(
    out_dir: str,
    max_docs: Optional[int] = None,
    private_every: int = 97,
    roots: Optional[List[str]] = None,
    base_urls: Optional[List[str]] = None,
    granularity: str = "module",
) -> dict:
    """Write the HTML site + robots.txt + manifest.json; returns the
    manifest.

    ``base_urls``: when given (e.g. http://127.0.0.1:8080 ...
    http://127.0.0.8:8080 — distinct loopback IPs, one server), each
    package cluster is assigned a stable host and links are absolute, so
    the corpus spans multiple real domains (the crawler's distinct-domain
    batching and per-domain politeness then behave like a real web crawl,
    reference frontierManagement.py:455-483).

    ``granularity``: "module" (one page per module, the round-3 default)
    or "section" (one page per documented API object — multiplies page
    count ~10x, reaching the reference's "100K+ documents" scale,
    reference README.md:292, with the same real prose)."""
    assert granularity in ("module", "section")
    recs = []
    taken: set = set()
    # section mode admits shorter (but still real) docstrings — a one- or
    # two-sentence API doc is a legitimate thin page; measured yield over
    # this machine's site-packages: 104,140 pages from 11,957 modules
    kw = (
        dict(min_chars=200, min_doc_chars=64)
        if granularity == "section"
        else {}
    )
    for rec in iter_module_docs(roots=roots, **kw):
        if granularity == "section":
            if rec["module"] in taken:  # a section page took this name
                rec = dict(rec, module=rec["module"] + ".module")
            taken.add(rec["module"])
            recs.extend(_split_sections(rec, taken))
        else:
            recs.append(rec)
        if max_docs and len(recs) >= max_docs:
            recs = recs[:max_docs]
            break
    by_mod: Dict[str, dict] = {r["module"]: r for r in recs}
    bases = base_urls or [""]

    def host_of(mod: str) -> str:
        pkg = mod.split(".")[0]
        h = 0
        for ch in pkg:  # stable across processes (hash() is seeded)
            h = (h * 131 + ord(ch)) % 1_000_003
        return bases[h % len(bases)]
    # every ~private_every-th module goes under the robots-disallowed
    # subtree: a real crawl must NOT store those pages
    private = {
        r["module"] for i, r in enumerate(recs) if i % private_every == 96
    }

    def url_for(mod: str) -> str:
        return host_of(mod) + page_path(mod, mod in private)

    # Link topology with guaranteed reachability at realistic nav density:
    # many intermediate packages have no page (short/no __init__ doc), so
    # "parent/child/sibling" over literal dotted prefixes leaves orphan
    # islands.  Instead every module belongs to the GROUP of its nearest
    # EXISTING ancestor page (or its package's virtual root).  Each page
    # links: the index, its group parent, the next 4 group members in a
    # cyclic chain (so a group is fully connected from any member), and
    # the first 6 members of each group it parents.  The index links one
    # member per package, which reaches the package's virtual-root group
    # via the chain, and everything below by descent.
    group_of: Dict[str, str] = {}
    groups: Dict[str, List[str]] = {}
    for m in by_mod:
        parts = m.split(".")
        anc = None
        for i in range(len(parts) - 1, 0, -1):
            cand = ".".join(parts[:i])
            if cand in by_mod:
                anc = cand
                break
        key = anc if anc is not None else f"<root:{parts[0]}>"
        group_of[m] = key
        groups.setdefault(key, []).append(m)
    for v in groups.values():
        v.sort()

    # Within a group, pages carry a sidebar-style nav (like real Sphinx /
    # MkDocs sites): every member links the group's block leaders (every
    # ceil(sqrt(n))-th member) plus its own block — diameter 2, so the
    # crawler's depth-5 limit (reference frontierManagement.py MAX_DEPTH)
    # never strands deep members of large packages.
    import math

    def links_for(mod: str) -> List[Tuple[str, str]]:
        out: List[Tuple[str, str]] = [(bases[0] + "/", "index")]
        key = group_of[mod]
        if not key.startswith("<root:"):
            out.append((url_for(key), key))
        members = groups[key]
        n = len(members)
        if n > 1:
            bs = max(1, math.isqrt(n - 1) + 1)
            i = members.index(mod)
            # cap the sidebar at realistic density (~40 links): 20 block
            # leaders + 20 own-block neighbors.  Reachability no longer
            # depends on the sidebar — the paginated /archive keeps every
            # public page at depth 2 — and uncapped sqrt-blocks made 28k-
            # member groups emit ~335 links/page (2.4 GB of nav HTML that
            # throttled the crawl to ~4 pages/s on parse time alone).
            targets = dict.fromkeys(
                members[0::bs][:20]  # block leaders
                + members[(i // bs) * bs : (i // bs) * bs + 20]  # own block
            )
            targets.pop(mod, None)
            for m in targets:
                out.append((url_for(m), m))
        for m in groups.get(mod, [])[:6]:
            out.append((url_for(m), m))
        return out

    os.makedirs(out_dir, exist_ok=True)
    n_bytes = 0
    for rec in recs:
        p = page_path(rec["module"], rec["module"] in private)
        fs_path = os.path.join(out_dir, p.lstrip("/"))
        os.makedirs(os.path.dirname(fs_path), exist_ok=True)
        html_text = render_page(rec, links_for(rec["module"]))
        with open(fs_path, "w", encoding="utf-8") as f:
            f.write(html_text)
        n_bytes += len(html_text)

    # Paginated archive (the A-Z / archive index every real doc site has):
    # guarantees every public page sits at link depth 2 from the root, so
    # the crawler's depth-5 limit never strands pages at 100k+ scale (the
    # 22k-page module-granularity crawl reached only 9,103 pages through
    # hierarchy nav alone).  Named "archive", not "sitemap": *.xml sitemap
    # URLs are excluded by crawl policy (helpers.is_sitemap_url, mirroring
    # the reference's exclusion, crawler/helpers.py:39-53).
    ARCHIVE_PER_PAGE = 200
    public = [r for r in recs if r["module"] not in private]
    n_arch = (len(public) + ARCHIVE_PER_PAGE - 1) // ARCHIVE_PER_PAGE
    os.makedirs(os.path.join(out_dir, "archive"), exist_ok=True)
    for i in range(n_arch):
        chunk = public[i * ARCHIVE_PER_PAGE : (i + 1) * ARCHIVE_PER_PAGE]
        items = "".join(
            f'<li><a href="{url_for(r["module"])}">'
            f"{html.escape(r['module'])}</a></li>"
            for r in chunk
        )
        nav = [(bases[0] + "/", "index")]
        if i > 0:
            nav.append((f"{bases[0]}/archive/p{i-1}.html", "previous"))
        if i + 1 < n_arch:
            nav.append((f"{bases[0]}/archive/p{i+1}.html", "next"))
        anchors = "".join(
            f'<li><a href="{href}">{html.escape(text)}</a></li>'
            for href, text in nav
        )
        with open(os.path.join(out_dir, f"archive/p{i}.html"), "w") as f:
            f.write(
                f"<html><head><title>Site archive — page {i + 1} of "
                f"{n_arch}</title></head><body><main>"
                f"<h1>All documentation pages ({i * ARCHIVE_PER_PAGE + 1}"
                f"–{i * ARCHIVE_PER_PAGE + len(chunk)})</h1>"
                f"<ul>{items}</ul></main>"
                f"<nav><ul>{anchors}</ul></nav></body></html>"
            )

    # root index: top-level package hubs
    top = sorted({r["package"] for r in recs})
    hub_links = []
    for pkg in top:
        target = pkg if pkg in by_mod else next(
            (m for m in sorted(by_mod) if m.split(".")[0] == pkg), None
        )
        if target:
            hub_links.append(
                f'<li><a href="{url_for(target)}">'
                f"{html.escape(pkg)}</a></li>"
            )
    arch_links = "".join(
        f'<li><a href="{bases[0]}/archive/p{i}.html">archive p{i}</a></li>'
        for i in range(n_arch)
    )
    with open(os.path.join(out_dir, "index.html"), "w") as f:
        f.write(
            "<html><head><title>Installed package documentation</title>"
            "</head><body><main><h1>Installed package documentation</h1>"
            "<p>Real API documentation pages extracted from the Python "
            "packages installed on this machine, one page per "
            f"{granularity}.</p>"
            f"</main><nav><ul>{''.join(hub_links)}{arch_links}</ul>"
            "</nav></body></html>"
        )
    with open(os.path.join(out_dir, "robots.txt"), "w") as f:
        f.write("User-agent: *\nDisallow: /private\nCrawl-delay: 0\n")

    per_pkg: Dict[str, int] = {}
    for r in recs:
        per_pkg[r["package"]] = per_pkg.get(r["package"], 0) + 1
    manifest = {
        "generator": "tools/make_real_corpus.py",
        "source": "docstrings of installed site-packages (AST-extracted)",
        "granularity": granularity,
        "n_pages": len(recs),
        "n_archive_pages": n_arch,
        "n_private_pages": len(private),
        "prose_bytes": n_bytes,
        "packages": dict(
            sorted(per_pkg.items(), key=lambda kv: -kv[1])
        ),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="site output directory")
    ap.add_argument("--max-docs", type=int, default=None)
    ap.add_argument("--granularity", choices=["module", "section"],
                    default="module")
    ap.add_argument("--pairs", default=None,
                    help="write query\\tpassage TSV here instead")
    ap.add_argument("--min-pairs", type=int, default=100_000)
    ap.add_argument("--rich", action="store_true",
                    help="add full-ICT / question / keyword / title pairs "
                         "(~5x volume; VERDICT r3 #4 scale-up)")
    args = ap.parse_args()
    if args.pairs:
        n = 0
        with open(args.pairs, "w", encoding="utf-8") as f:
            for q, p in iter_pairs(rich=args.rich):
                f.write(q.replace("\t", " ") + "\t" + p + "\n")
                n += 1
        print(json.dumps({"pairs": n, "path": args.pairs}))
        if n < args.min_pairs:
            print(
                f"warning: only {n} pairs (< {args.min_pairs})",
                file=sys.stderr,
            )
        return
    if not args.out:
        ap.error("--out or --pairs required")
    manifest = build_site(
        args.out, max_docs=args.max_docs, granularity=args.granularity
    )
    print(json.dumps(manifest)[:2000])


if __name__ == "__main__":
    main()
