// Headless harness: run the embedded moebius script against a DOM stub.
const fs = require("fs");
const html = fs.readFileSync(process.argv[2], "utf8");
const payload = html.match(/<script id="payload" type="application\/json">([\s\S]*?)<\/script>/)[1];
const js = html.match(/<script>\n([\s\S]*?)<\/script>/)[1];
function el() {
  return {
    attrs: {}, children: [], textContent: "",
    setAttribute(k, v) { this.attrs[k] = v; },
    getAttribute(k) { return this.attrs[k]; },
    appendChild(c) { this.children.push(c); return c; },
    addEventListener() {},
  };
}
const svg = el(), meta = el();
const document = {
  getElementById(id) {
    if (id === "payload") return { textContent: payload.replace(/<\\\//g, "</") };
    if (id === "g") return svg;
    if (id === "meta") return meta;
  },
  createElementNS(ns, tag) { const e = el(); e.tag = tag; return e; },
};
eval(js);
// assertions: every node drawn with finite in-bounds coordinates
const circles = svg.children.filter(c => c.tag === "circle");
const lines = svg.children.filter(c => c.tag === "line");
for (const c of circles) {
  const x = +c.attrs.cx, y = +c.attrs.cy;
  if (!isFinite(x) || !isFinite(y) || x < 0 || x > 960 || y < 0 || y > 640)
    throw new Error("bad coord " + x + "," + y);
}
for (const l of lines)
  if (![l.attrs.x1, l.attrs.y1, l.attrs.x2, l.attrs.y2].every(v => isFinite(+v)))
    throw new Error("bad line");
console.log("HEADLESS OK:", meta.textContent, "| circles:", circles.length, "lines:", lines.length);
