"""Sync the README performance table from a bench JSON (VERDICT r4 weak #3:
committed README numbers must quote the committed bench artifact verbatim).

    python tools/render_readme.py BENCH_rNN.json [README.md]

Replaces the table between the `<!-- bench:begin -->` / `<!-- bench:end -->`
markers with rows rendered from the JSON (either the driver's wrapper
format with a "parsed" field, or bench.py's raw line).
"""

import json
import re
import sys


def render(parsed: dict) -> str:
    k = parsed
    tm = k["table_mug"]
    cem = k["cem"]
    rows = [
        "| Workload | Throughput | p50 latency |",
        "|---|---|---|",
        f"| krylon.pcd, 15ch, 500 samples | **{k['value']:,.0f} cand/s** | "
        f"{k['p50_latency_s']*1e3:.0f} ms cloud→grasps |",
        f"| table_mug.pcd, 15ch, 5,000 samples, clustering on | "
        f"**{tm['candidates_per_sec']:,.0f} cand/s** | "
        f"{tm['p50_latency_s']*1e3:.0f} ms cloud→grasps |",
        f"| CEM (50 init + 5×50, SUM of Gaussians), krylon | — | "
        f"{cem['total_s_p50']*1e3:.0f} ms total |",
    ]
    if "max_of_gaussians" in cem:
        rows.append(
            f"| CEM (MAX of Gaussians), krylon | — | "
            f"{cem['max_of_gaussians']['total_s_p50']*1e3:.0f} ms total |")
    if "table_mug" in cem:
        rows.append(
            f"| CEM (SUM of Gaussians), table_mug | — | "
            f"{cem['table_mug']['total_s_p50']*1e3:.0f} ms total |")
    if "sharded" in parsed:
        sh = parsed["sharded"]
        rows.append(
            f"| krylon via shard_map (1-device mesh) | "
            f"**{sh['candidates_per_sec']:,.0f} cand/s** | "
            f"{sh['p50_latency_s']*1e3:.0f} ms "
            f"({sh['overhead_vs_direct_pct']:+.1f}% vs direct) |")
    return "\n".join(rows)


def main():
    bench_path = sys.argv[1]
    readme_path = sys.argv[2] if len(sys.argv) > 2 else "README.md"
    with open(bench_path) as f:
        data = json.load(f)
    parsed = data.get("parsed", data)
    table = render(parsed)
    with open(readme_path) as f:
        text = f.read()
    pat = re.compile(r"(<!-- bench:begin -->\n).*?(\n<!-- bench:end -->)",
                     re.S)
    if not pat.search(text):
        raise SystemExit("README markers <!-- bench:begin/end --> not found")
    text = pat.sub(lambda m: m.group(1) + table + m.group(2), text)
    with open(readme_path, "w") as f:
        f.write(text)
    print(f"README table updated from {bench_path}")


if __name__ == "__main__":
    main()
