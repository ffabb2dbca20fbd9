"""UI static contract checks (VERDICT r1 #10, air-gapped form).

No browser or JS engine exists in this image (no node/deno/quickjs, no
js2py), so the bubble UI cannot be *executed* here.  These tests enforce
the next-strongest contract statically:

  * main.js lexes cleanly (string/comment-aware bracket balance — catches
    truncation, merge damage, unterminated strings);
  * every function invoked in main.js is defined there (or a known
    browser/builtin global);
  * every DOM id referenced from JS exists in index.html;
  * every API endpoint the JS fetches is routed by the serving app;
  * CSS classes assigned from JS exist in style.css.

A real browser smoke (layout produces positioned nodes) still requires an
environment with chromium/node — tracked in docs/PARITY.md.
"""

import re
from pathlib import Path

UI = Path(__file__).resolve().parent.parent / "ui"
MAIN_JS = (UI / "static" / "main.js").read_text()
INDEX_HTML = (UI / "templates" / "index.html").read_text()
STYLE_CSS = (UI / "static" / "style.css").read_text()


def lex_js(src: str):
    """Strip strings/comments; return (cleaned_source, bracket_error)."""
    out = []
    i, n = 0, len(src)
    stack = []
    pairs = {")": "(", "]": "[", "}": "{"}
    while i < n:
        c = src[i]
        if c in "\"'`":
            quote = c
            i += 1
            while i < n:
                if src[i] == "\\":
                    i += 2
                    continue
                if src[i] == quote:
                    break
                # template literal interpolation: lex inside ${ }
                if quote == "`" and src[i : i + 2] == "${":
                    depth = 1
                    i += 2
                    while i < n and depth:
                        if src[i] == "{":
                            depth += 1
                        elif src[i] == "}":
                            depth -= 1
                        i += 1
                    continue
                i += 1
            if i >= n:
                return "".join(out), f"unterminated string at {i}"
            i += 1
            out.append('""')
            continue
        if src[i : i + 2] == "//":
            while i < n and src[i] != "\n":
                i += 1
            continue
        if src[i : i + 2] == "/*":
            end = src.find("*/", i + 2)
            if end < 0:
                return "".join(out), "unterminated block comment"
            i = end + 2
            continue
        if c in "([{":
            stack.append(c)
        elif c in ")]}":
            if not stack or stack[-1] != pairs[c]:
                line = src.count("\n", 0, i) + 1
                return "".join(out), f"unbalanced {c!r} at line {line}"
            stack.pop()
        out.append(c)
        i += 1
    if stack:
        return "".join(out), f"unclosed {stack[-1]!r}"
    return "".join(out), None


CLEAN, LEX_ERR = lex_js(MAIN_JS)

_BROWSER_GLOBALS = {
    # browser APIs and JS builtins legitimately called from main.js
    "fetch", "alert", "requestAnimationFrame", "setTimeout", "parseFloat",
    "parseInt", "encodeURIComponent", "String", "Number", "Array", "Map",
    "Set", "Object", "Math", "JSON", "Promise", "Error", "Blob", "URL",
    "Date", "isFinite", "performance", "document", "window", "console",
}


class TestJsLexes:
    def test_brackets_and_strings_balanced(self):
        assert LEX_ERR is None, LEX_ERR

    def test_no_merge_markers(self):
        for marker in ("<<<<<<<", ">>>>>>>", "======="):
            assert marker not in MAIN_JS


class TestFunctionWiring:
    def test_every_called_function_is_defined(self):
        defined = set(re.findall(r"function\s+([A-Za-z_$][\w$]*)", CLEAN))
        defined |= set(
            re.findall(r"(?:const|let|var)\s+([A-Za-z_$][\w$]*)\s*=", CLEAN)
        )
        # bare calls `name(...)` not preceded by `.` (method calls are on
        # objects we can't check statically)
        called = set(
            m.group(1)
            for m in re.finditer(r"(?<![.\w$])([A-Za-z_$][\w$]*)\s*\(", CLEAN)
        ) - {"function", "if", "for", "while", "switch", "catch", "return"}
        unknown = called - defined - _BROWSER_GLOBALS
        assert not unknown, f"undefined functions called: {sorted(unknown)}"


class TestDomWiring:
    def test_all_dom_ids_exist_in_html(self):
        ids_js = set(
            re.findall(r"getElementById\(\s*[\"']([^\"']+)[\"']", MAIN_JS)
        )
        ids_html = set(re.findall(r"id=[\"']([^\"']+)[\"']", INDEX_HTML))
        missing = ids_js - ids_html
        assert not missing, f"JS references missing DOM ids: {sorted(missing)}"
        assert len(ids_js) >= 10  # the UI is actually wired, not vestigial

    def test_js_and_css_files_referenced_by_page(self):
        assert "main.js" in INDEX_HTML
        assert "style.css" in INDEX_HTML


class TestEndpointWiring:
    def test_fetched_endpoints_are_routed(self):
        from modern_search_engines_project_tpu.serving.api import SearchService

        class _Eng:
            cfg = type("C", (), {"top_k_reranking": 10,
                                 "query_batch_size": 8})()
            times = None

        routes = set()
        app = SearchService(_Eng()).build_app()
        for r in app.router.routes():
            info = r.resource.get_info() if r.resource else {}
            if "path" in info:
                routes.add(info["path"])
            elif "formatter" in info:
                routes.add(info["formatter"])
        fetched = set(re.findall(r"fetch\(\s*[\"']([^\"'?]+)", MAIN_JS))
        unrouted = {f for f in fetched if f not in routes}
        assert not unrouted, f"JS fetches unrouted endpoints: {unrouted}"


class TestCssWiring:
    def test_js_assigned_classes_exist_in_css(self):
        classes_js = set()
        for m in re.finditer(
            r"(?:className\s*=\s*|classList\.(?:add|toggle|remove)\()"
            r"[\"']([^\"']+)[\"']",
            MAIN_JS,
        ):
            classes_js.update(m.group(1).split())
        for m in re.finditer(
            r"setAttribute\(\s*[\"']class[\"']\s*,\s*[\"']([^\"']+)[\"']",
            MAIN_JS,
        ):
            classes_js.update(m.group(1).split())
        css_classes = set(re.findall(r"\.([A-Za-z_][\w-]*)", STYLE_CSS))
        missing = classes_js - css_classes
        assert not missing, f"JS assigns unstyled classes: {sorted(missing)}"
