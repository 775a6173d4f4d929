#!/usr/bin/env python3
"""Headless replay renderer: draws frames of a (roadnet log, replay log)
pair — the exact files the bundled viewer (frontend/index.html) and the
reference PIXI player consume — to PNG images.

This is the automated "the player renders our logs" artifact (VERDICT
r02 item 10): tests/test_replay_render.py renders frames from an
Engine-generated log pair and asserts roads and vehicles actually appear
at the logged positions. Optionally overlays a metric chart file
(reference docs/source/replay.rst:37-55 format: title line, then one
whitespace-separated row of metric columns per step).

Usage:
  python tools/render_replay.py roadnet.json replay.txt out_dir \
      [--frames 0,10,50] [--chart chart.txt] [--size 900]
"""

import argparse
import json
import math
import os


def load_replay(path):
    frames = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            veh_part = line.split(";")[0]
            cars = []
            for tok in veh_part.split(","):
                p = tok.split()
                if len(p) == 7:
                    cars.append(dict(x=float(p[0]), y=float(p[1]),
                                     ang=float(p[2]), id=p[3],
                                     lc=int(p[4]), len=float(p[5]),
                                     width=float(p[6])))
            frames.append(cars)
    return frames


def load_chart(path):
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f if ln.strip()]
    return {"title": lines[0],
            "rows": [[float(x) for x in ln.split()] for ln in lines[1:]]}


class Renderer:
    def __init__(self, net_doc, size=900):
        from PIL import Image, ImageDraw
        self.Image, self.ImageDraw = Image, ImageDraw
        self.net = net_doc["static"]
        xs, ys = [], []
        for e in self.net["edges"]:
            for p in e["points"]:
                xs.append(p[0]); ys.append(p[1])
        self.minx, self.maxx = min(xs), max(xs)
        self.miny, self.maxy = min(ys), max(ys)
        self.size = size
        self.scale = 0.92 * size / max(self.maxx - self.minx + 1,
                                       self.maxy - self.miny + 1)

    def xy(self, x, y):
        return ((x - self.minx) * self.scale + 0.04 * self.size,
                (self.maxy - y) * self.scale + 0.04 * self.size)

    def frame(self, cars, chart=None, step=None):
        img = self.Image.new("RGB", (self.size, self.size), (16, 16, 18))
        d = self.ImageDraw.Draw(img)
        for e in self.net["edges"]:
            w = max(1, int(sum(e.get("laneWidths", [3])) * self.scale / 2))
            pts = [self.xy(p[0], p[1]) for p in e["points"]]
            d.line(pts, fill=(70, 70, 75), width=w)
        for n in self.net["nodes"]:
            o = n.get("outline", [])
            if len(o) >= 6:
                pts = [self.xy(o[i], o[i + 1]) for i in range(0, len(o), 2)]
                d.polygon(pts, fill=(50, 52, 58))
        for c in cars:
            x, y = self.xy(c["x"], c["y"])
            L = max(2.0, c["len"] * self.scale)
            W = max(1.5, c["width"] * self.scale)
            ca, sa = math.cos(c["ang"]), -math.sin(c["ang"])
            # rectangle centered on (x, y), heading ang
            hx, hy = ca * L / 2, sa * L / 2
            px, py = -sa * W / 2, ca * W / 2
            quad = [(x - hx - px, y - hy - py), (x - hx + px, y - hy + py),
                    (x + hx + px, y + hy + py), (x + hx - px, y + hy - py)]
            color = (80, 180, 250) if c["lc"] == 0 else (250, 160, 80)
            d.polygon(quad, fill=color)
        if chart is not None and step is not None and chart["rows"]:
            self._chart(d, chart, min(step, len(chart["rows"]) - 1))
        return img

    def _chart(self, d, chart, upto):
        w, h = self.size, self.size
        cw, ch = int(w * 0.32), int(h * 0.2)
        x0, y0 = w - cw - 8, h - ch - 8
        d.rectangle([x0, y0, x0 + cw, y0 + ch], fill=(25, 25, 30),
                    outline=(90, 90, 95))
        d.text((x0 + 6, y0 + 4), chart["title"], fill=(220, 220, 220))
        rows = chart["rows"]
        ncol = len(rows[0])
        lo = min(min(r) for r in rows)
        hi = max(max(r) for r in rows) or 1.0
        colors = [(80, 180, 250), (250, 160, 80), (140, 230, 120),
                  (230, 120, 200), (230, 230, 110)]
        for c in range(ncol):
            pts = []
            for t in range(upto + 1):
                px = x0 + 6 + (cw - 12) * (t / max(len(rows) - 1, 1))
                v = (rows[t][c] - lo) / max(hi - lo, 1e-9)
                py = y0 + ch - 6 - (ch - 26) * v
                pts.append((px, py))
            if len(pts) > 1:
                d.line(pts, fill=colors[c % len(colors)], width=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("roadnet")
    ap.add_argument("replay")
    ap.add_argument("out_dir")
    ap.add_argument("--frames", default="0")
    ap.add_argument("--chart", default=None)
    ap.add_argument("--size", type=int, default=900)
    args = ap.parse_args()

    net_doc = json.load(open(args.roadnet))
    frames = load_replay(args.replay)
    chart = load_chart(args.chart) if args.chart else None
    r = Renderer(net_doc, args.size)
    os.makedirs(args.out_dir, exist_ok=True)
    for fi in [int(x) for x in args.frames.split(",")]:
        img = r.frame(frames[fi], chart, fi)
        out = os.path.join(args.out_dir, f"frame_{fi:05d}.png")
        img.save(out)
        print(out, f"({len(frames[fi])} vehicles)")


if __name__ == "__main__":
    main()
