/* Tübingen Search UI — bubble + list views over POST /api/search.
 *
 * Capability parity with the reference UI (static/main.js): domain-grouped
 * bubble clusters (cluster radius ~ sqrt of summed scores, doc radius
 * linear in score), two-phase d3-force layout (clusters first, then docs
 * around their cluster center), zoom/pan with auto-fit, top-10 emphasis,
 * hover tooltip + click-through, list view toggle, tab-separated result
 * export, and an LLM summary pane.  Independent implementation.
 */

(() => {
  const svg = d3.select("#bubble-svg");
  const tooltip = document.getElementById("tooltip");
  const statusEl = document.getElementById("status");
  let results = [];
  let lastQuery = "";
  let zoom = null;

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
      lastQuery = query;
      statusEl.textContent = `${results.length} results in ${((performance.now() - t0) / 1000).toFixed(2)}s`;
      renderLlm(data.llm_response);
      renderBubbles();
      renderList();
    } catch (err) {
      statusEl.textContent = `Error: ${err.message}`;
    }
  }

  function renderLlm(text) {
    const pane = document.getElementById("llm-pane");
    const target = document.getElementById("llm-text");
    if (!text) { pane.classList.add("hidden"); return; }
    pane.classList.remove("hidden");
    // minimal markdown-ish formatting: bold + paragraphs
    target.innerHTML = text
      .replace(/&/g, "&amp;").replace(/</g, "&lt;")
      .replace(/\*\*(.+?)\*\*/g, "<b>$1</b>")
      .replace(/\n\n/g, "<br><br>");
  }

  // ---------- bubble view ----------
  function renderBubbles() {
    svg.selectAll("*").remove();
    const area = document.getElementById("bubble-view");
    const W = area.clientWidth || 900;
    const H = area.clientHeight || 600;
    svg.attr("viewBox", `0 0 ${W} ${H}`);
    if (!results.length) return;

    // group by domain topic
    const byDomain = d3.group(results, (d) => d.domain || "unknown");
    const clusters = Array.from(byDomain, ([domain, docs]) => ({
      domain,
      docs,
      total: d3.sum(docs, (d) => d.score),
    }));
    const clusterR = d3
      .scaleSqrt()
      .domain([0, d3.max(clusters, (c) => c.total) || 1])
      .range([40, Math.min(W, H) / 4]);
    const docR = d3
      .scaleLinear()
      .domain(d3.extent(results, (d) => d.score))
      .range([18, 50]);
    const color = d3.scaleOrdinal(d3.schemeTableau10).domain(clusters.map((c) => c.domain));

    // phase 1: cluster layout
    const sim1 = d3
      .forceSimulation(clusters)
      .force("center", d3.forceCenter(W / 2, H / 2))
      .force("charge", d3.forceManyBody().strength(8))
      .force("collide", d3.forceCollide((c) => clusterR(c.total) + 14))
      .stop();
    for (let i = 0; i < 200; i++) sim1.tick();

    // phase 2: docs around their cluster center
    const nodes = [];
    for (const c of clusters) {
      for (const doc of c.docs) {
        nodes.push({ ...doc, cx: c.x, cy: c.y, cluster: c.domain });
      }
    }
    const sim2 = d3
      .forceSimulation(nodes)
      .force("x", d3.forceX((d) => d.cx).strength(0.25))
      .force("y", d3.forceY((d) => d.cy).strength(0.25))
      .force("collide", d3.forceCollide((d) => docR(d.score) + 2))
      .stop();
    for (let i = 0; i < 150; i++) sim2.tick();

    const root = svg.append("g").attr("class", "zoom-root");

    root
      .selectAll("text.cluster-label")
      .data(clusters)
      .join("text")
      .attr("class", "cluster-label")
      .attr("x", (c) => c.x)
      .attr("y", (c) => c.y - clusterR(c.total) - 6)
      .text((c) => c.domain);

    const g = root
      .selectAll("g.doc")
      .data(nodes)
      .join("g")
      .attr("class", "doc")
      .attr("transform", (d) => `translate(${d.x},${d.y})`)
      .style("cursor", "pointer")
      .on("mousemove", (ev, d) => showTooltip(ev, d))
      .on("mouseleave", hideTooltip)
      .on("click", (ev, d) => window.open(d.url, "_blank"));

    g.append("circle")
      .attr("r", (d) => docR(d.score))
      .attr("fill", (d) => color(d.cluster))
      .attr("fill-opacity", (d) => (d.rank <= 10 ? 0.95 : 0.45))
      .attr("stroke", "#0c111c")
      .attr("stroke-width", 1.5);

    g.append("text")
      .attr("class", "bubble-label")
      .attr("dy", 4)
      .text((d) => (d.rank <= 10 ? `#${d.rank}` : ""));

    // zoom / pan with auto-fit
    zoom = d3.zoom().scaleExtent([0.2, 6]).on("zoom", (ev) => {
      root.attr("transform", ev.transform);
    });
    svg.call(zoom);
    const xs = nodes.map((n) => n.x), ys = nodes.map((n) => n.y);
    const pad = 60;
    const bw = d3.max(xs) - d3.min(xs) + 2 * pad;
    const bh = d3.max(ys) - d3.min(ys) + 2 * pad;
    const k = Math.min(W / bw, H / bh, 1.5);
    const tx = W / 2 - k * (d3.min(xs) + d3.max(xs)) / 2;
    const ty = H / 2 - k * (d3.min(ys) + d3.max(ys)) / 2;
    svg.call(zoom.transform, d3.zoomIdentity.translate(tx, ty).scale(k));
  }

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
  function escapeHtml(s) {
    return String(s || "").replace(/&/g, "&amp;").replace(/</g, "&lt;");
  }

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

  // ---------- view toggle / export / zoom buttons ----------
  document.getElementById("toggle-view").addEventListener("click", (ev) => {
    const bubble = document.getElementById("bubble-view");
    const list = document.getElementById("list-view");
    const showList = list.classList.contains("hidden");
    list.classList.toggle("hidden", !showList);
    bubble.classList.toggle("hidden", showList);
    ev.target.textContent = showList ? "Bubble view" : "List view";
  });

  document.getElementById("export-btn").addEventListener("click", () => {
    // query_num\trank\turl\tscore download (reference export format)
    const lines = results.map((d) => `1\t${d.rank}\t${d.url}\t${Number(d.score).toFixed(3)}`);
    const blob = new Blob([lines.join("\n") + "\n"], { type: "text/plain" });
    const a = document.createElement("a");
    a.href = URL.createObjectURL(blob);
    a.download = "search_results.txt";
    a.click();
    URL.revokeObjectURL(a.href);
  });

  document.getElementById("zoom-in").addEventListener("click", () =>
    svg.transition().call(zoom.scaleBy, 1.35));
  document.getElementById("zoom-out").addEventListener("click", () =>
    svg.transition().call(zoom.scaleBy, 0.74));
  document.getElementById("zoom-fit").addEventListener("click", renderBubbles);

  document.getElementById("search-form").addEventListener("submit", (ev) => {
    ev.preventDefault();
    const q = document.getElementById("search-input").value.trim();
    if (q) runSearch(q);
  });
})();
