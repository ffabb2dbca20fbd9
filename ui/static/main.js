/* Tübingen Search UI — bubble + list views over POST /api/search.
 *
 * Capability parity with the reference UI (static/main.js): domain-grouped
 * bubble clusters (cluster radius ~ sqrt of summed scores, doc radius
 * linear in score), two-phase force layout (clusters first, then docs
 * around their cluster center), zoom/pan with auto-fit, top-10 emphasis,
 * hover tooltip + click-through, list view toggle, tab-separated result
 * export, and an LLM summary pane.
 *
 * Fully self-contained: no CDN dependencies (the reference pulls D3 from
 * d3js.org; this build ships its own small force layout + SVG rendering so
 * it works in air-gapped deployments).
 */

(() => {
  const SVG_NS = "http://www.w3.org/2000/svg";
  const svg = document.getElementById("bubble-svg");
  const tooltip = document.getElementById("tooltip");
  const statusEl = document.getElementById("status");
  const PALETTE = [
    "#5ac8fa", "#ffb347", "#7ddc82", "#f57fb0", "#b18cff",
    "#ffd760", "#6fe3d2", "#ff8d70", "#9fc1ff", "#d4e86a",
  ];
  let results = [];
  let view = { x: 0, y: 0, k: 1 };
  let rootG = null;

  // ---------- search ----------
  async function runSearch(query) {
    statusEl.textContent = "Searching…";
    const t0 = performance.now();
    try {
      const resp = await fetch("/api/search", {
        method: "POST",
        headers: { "Content-Type": "application/json" },
        body: JSON.stringify({ query, top_k: 100 }),
      });
      if (!resp.ok) throw new Error(`HTTP ${resp.status}`);
      const data = await resp.json();
      results = data.documents || [];
      statusEl.textContent = `${results.length} results in ${((performance.now() - t0) / 1000).toFixed(2)}s`;
      renderLlm(data.llm_response);
      renderBubbles();
      renderList();
    } catch (err) {
      statusEl.textContent = `Error: ${err.message}`;
    }
  }

  function escapeHtml(s) {
    return String(s || "").replace(/&/g, "&amp;").replace(/</g, "&lt;");
  }

  function renderLlm(text) {
    const pane = document.getElementById("llm-pane");
    const target = document.getElementById("llm-text");
    if (!text) { pane.classList.add("hidden"); return; }
    pane.classList.remove("hidden");
    target.innerHTML = escapeHtml(text)
      .replace(/\*\*(.+?)\*\*/g, "<b>$1</b>")
      .replace(/\n\n/g, "<br><br>");
  }

  // ---------- tiny force layout ----------
  function relaxCollisions(nodes, iterations, attract) {
    for (let it = 0; it < iterations; it++) {
      if (attract) {
        for (const n of nodes) {
          n.x += (n.tx - n.x) * 0.25;
          n.y += (n.ty - n.y) * 0.25;
        }
      }
      for (let i = 0; i < nodes.length; i++) {
        for (let j = i + 1; j < nodes.length; j++) {
          const a = nodes[i], b = nodes[j];
          const dx = b.x - a.x, dy = b.y - a.y;
          const dist = Math.max(Math.hypot(dx, dy), 1e-3);
          const overlap = a.r + b.r + 3 - dist;
          if (overlap > 0) {
            const ux = dx / dist, uy = dy / dist;
            a.x -= ux * overlap / 2; a.y -= uy * overlap / 2;
            b.x += ux * overlap / 2; b.y += uy * overlap / 2;
          }
        }
      }
    }
  }

  function spiralSeed(nodes, cx, cy) {
    nodes.forEach((n, i) => {
      const ang = i * 2.399963;  // golden angle
      const rad = 12 * Math.sqrt(i + 1) + n.r;
      n.x = cx + rad * Math.cos(ang);
      n.y = cy + rad * Math.sin(ang);
    });
  }

  // ---------- bubble view ----------
  function el(name, attrs, parent) {
    const node = document.createElementNS(SVG_NS, name);
    for (const [k, v] of Object.entries(attrs || {})) node.setAttribute(k, v);
    if (parent) parent.appendChild(node);
    return node;
  }

  function applyView() {
    if (rootG) {
      rootG.setAttribute(
        "transform", `translate(${view.x},${view.y}) scale(${view.k})`);
    }
  }

  function renderBubbles() {
    while (svg.firstChild) svg.removeChild(svg.firstChild);
    const area = document.getElementById("bubble-view");
    const W = area.clientWidth || 900;
    const H = area.clientHeight || 600;
    svg.setAttribute("viewBox", `0 0 ${W} ${H}`);
    if (!results.length) return;

    // group by domain
    const byDomain = new Map();
    for (const d of results) {
      const key = d.domain || "unknown";
      if (!byDomain.has(key)) byDomain.set(key, []);
      byDomain.get(key).push(d);
    }
    const scores = results.map((d) => d.score);
    const sMin = Math.min(...scores), sMax = Math.max(...scores);
    const docR = (s) =>
      18 + 32 * (sMax > sMin ? (s - sMin) / (sMax - sMin) : 0.5);

    const clusters = [...byDomain.entries()].map(([domain, docs], i) => {
      const total = docs.reduce((acc, d) => acc + d.score, 0);
      return { domain, docs, total, color: PALETTE[i % PALETTE.length] };
    });
    const tMax = Math.max(...clusters.map((c) => c.total), 1e-9);
    for (const c of clusters) {
      // cluster radius ~ sqrt of summed scores, floored to fit its docs
      const docArea = c.docs.reduce((a, d) => a + docR(d.score) ** 2, 0);
      c.r = Math.max(40 + 110 * Math.sqrt(c.total / tMax), Math.sqrt(docArea) * 1.7);
    }

    // phase 1: cluster layout
    spiralSeed(clusters, W / 2, H / 2);
    relaxCollisions(clusters, 120, false);

    // phase 2: docs inside their cluster
    const nodes = [];
    for (const c of clusters) {
      const docNodes = c.docs.map((d) => ({ ...d, r: docR(d.score), tx: c.x, ty: c.y }));
      spiralSeed(docNodes, c.x, c.y);
      relaxCollisions(docNodes, 60, true);
      for (const n of docNodes) { n.cluster = c; nodes.push(n); }
    }

    rootG = el("g", {}, svg);
    for (const c of clusters) {
      el("text", {
        class: "cluster-label",
        x: c.x,
        y: c.y - c.r - 6,
      }, rootG).textContent = c.domain;
    }
    for (const n of nodes) {
      const g = el("g", { transform: `translate(${n.x},${n.y})` }, rootG);
      g.style.cursor = "pointer";
      el("circle", {
        r: n.r,
        fill: n.cluster.color,
        "fill-opacity": n.rank <= 10 ? 0.95 : 0.45,
        stroke: "#0c111c",
        "stroke-width": 1.5,
      }, g);
      if (n.rank <= 10) {
        el("text", { class: "bubble-label", dy: 4 }, g).textContent = `#${n.rank}`;
      }
      g.addEventListener("mousemove", (ev) => showTooltip(ev, n));
      g.addEventListener("mouseleave", hideTooltip);
      g.addEventListener("click", () => window.open(n.url, "_blank"));
    }

    // auto-fit
    const xs = nodes.map((n) => n.x), ys = nodes.map((n) => n.y);
    const pad = 70;
    const minX = Math.min(...xs) - pad, maxX = Math.max(...xs) + pad;
    const minY = Math.min(...ys) - pad, maxY = Math.max(...ys) + pad;
    const k = Math.min(W / (maxX - minX), H / (maxY - minY), 1.5);
    view = {
      k,
      x: W / 2 - k * (minX + maxX) / 2,
      y: H / 2 - k * (minY + maxY) / 2,
    };
    applyView();
  }

  // ---------- zoom / pan ----------
  svg.addEventListener("wheel", (ev) => {
    ev.preventDefault();
    const factor = ev.deltaY < 0 ? 1.12 : 0.89;
    zoomBy(factor, ev.offsetX, ev.offsetY);
  }, { passive: false });

  function zoomBy(factor, cx, cy) {
    const k2 = Math.min(Math.max(view.k * factor, 0.2), 6);
    const ratio = k2 / view.k;
    if (cx === undefined) {
      const r = svg.getBoundingClientRect();
      cx = r.width / 2; cy = r.height / 2;
    }
    view.x = cx - ratio * (cx - view.x);
    view.y = cy - ratio * (cy - view.y);
    view.k = k2;
    applyView();
  }

  let dragging = null;
  svg.addEventListener("mousedown", (ev) => {
    dragging = { x: ev.clientX, y: ev.clientY, vx: view.x, vy: view.y };
  });
  window.addEventListener("mousemove", (ev) => {
    if (!dragging) return;
    view.x = dragging.vx + ev.clientX - dragging.x;
    view.y = dragging.vy + ev.clientY - dragging.y;
    applyView();
  });
  window.addEventListener("mouseup", () => { dragging = null; });

  // ---------- tooltip ----------
  function showTooltip(ev, d) {
    tooltip.classList.remove("hidden");
    tooltip.innerHTML =
      `<div class="t-title">#${d.rank} ${escapeHtml(d.title)}</div>` +
      `<div class="t-url">${escapeHtml(d.url)}</div>` +
      `<div>${escapeHtml(d.snippet || "")}</div>` +
      `<div class="t-url">score ${Number(d.score).toFixed(3)}</div>`;
    tooltip.style.left = `${ev.pageX + 14}px`;
    tooltip.style.top = `${ev.pageY + 14}px`;
  }
  function hideTooltip() { tooltip.classList.add("hidden"); }

  // ---------- list view ----------
  function renderList() {
    const list = document.getElementById("list-view");
    list.innerHTML = "";
    for (const d of results) {
      const item = document.createElement("div");
      item.className = "result-item";
      item.innerHTML =
        `<span class="score">${Number(d.score).toFixed(3)}</span>` +
        `<span class="rank">#${d.rank}</span>` +
        `<a href="${encodeURI(d.url)}" target="_blank" rel="noopener">${escapeHtml(d.title)}</a>` +
        `<div class="url">${escapeHtml(d.url)}</div>` +
        `<div class="snippet">${escapeHtml(d.snippet || "")}</div>`;
      list.appendChild(item);
    }
  }

  // ---------- controls ----------
  document.getElementById("toggle-view").addEventListener("click", (ev) => {
    const bubble = document.getElementById("bubble-view");
    const list = document.getElementById("list-view");
    const showList = list.classList.contains("hidden");
    list.classList.toggle("hidden", !showList);
    bubble.classList.toggle("hidden", showList);
    ev.target.textContent = showList ? "Bubble view" : "List view";
  });

  document.getElementById("export-btn").addEventListener("click", () => {
    const lines = results.map(
      (d) => `1\t${d.rank}\t${d.url}\t${Number(d.score).toFixed(3)}`);
    const blob = new Blob([lines.join("\n") + "\n"], { type: "text/plain" });
    const a = document.createElement("a");
    a.href = URL.createObjectURL(blob);
    a.download = "search_results.txt";
    a.click();
    URL.revokeObjectURL(a.href);
  });

  document.getElementById("zoom-in").addEventListener("click", () => zoomBy(1.35));
  document.getElementById("zoom-out").addEventListener("click", () => zoomBy(0.74));
  document.getElementById("zoom-fit").addEventListener("click", renderBubbles);

  document.getElementById("search-form").addEventListener("submit", (ev) => {
    ev.preventDefault();
    const q = document.getElementById("search-input").value.trim();
    if (q) runSearch(q);
  });
})();
