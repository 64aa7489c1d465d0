"""Benchmark suite runner: model × config matrix from a TOML file.

Parity with the reference's suite runner (reference python/krasis/suite.py:90
SuiteRunner): each combo runs as an isolated subprocess (fresh TPU
state), stdout metrics are parsed, and a markdown summary + per-combo
logs land under benchmarks/suite_logs/.

TOML schema:
    [suite]
    decode_tokens = 64
    prefill_lengths = [2048]

    [[combo]]
    name = "v2lite-q4"
    synthetic = "deepseek-v2-lite"    # or: model = "/path/to/ckpt"
    expert_bits = 4
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import tomllib
from typing import Dict, List


def run_combo(combo: Dict, suite_cfg: Dict, log_dir: str) -> Dict:
    name = combo.get("name", "combo")
    cmd = [sys.executable, "-m", "krasis_tpu.benchmark"]
    if combo.get("synthetic"):
        cmd += ["--synthetic", combo["synthetic"]]
    else:
        cmd += ["--model", combo["model"]]
    cmd += ["--expert-bits", str(combo.get("expert_bits", 4))]
    if combo.get("attention_quant"):
        cmd += ["--attention-quant", combo["attention_quant"]]
    if combo.get("decode_block"):
        cmd += ["--decode-block", str(combo["decode_block"])]
    pl = suite_cfg.get("prefill_lengths")
    if pl:
        cmd += ["--prefill-lengths"] + [str(x) for x in pl]
    if combo.get("max_len"):
        cmd += ["--max-len", str(combo["max_len"])]
    if combo.get("offload"):
        cmd += ["--offload", combo["offload"]]

    log_path = os.path.join(log_dir, f"{name}.log")
    t0 = time.time()
    with open(log_path, "w") as logf:
        proc = subprocess.run(
            cmd, stdout=subprocess.PIPE, stderr=logf,
            timeout=combo.get("timeout_s", 3600),
        )
    out = proc.stdout.decode()
    result: Dict = {"name": name, "elapsed_s": round(time.time() - t0, 1),
                    "rc": proc.returncode}
    # parse the last JSON object in stdout
    try:
        start = out.rindex("{")
        # walk back to the outermost JSON (report is pretty-printed)
        for i in range(len(out)):
            try:
                result["report"] = json.loads(out[i:])
                break
            except json.JSONDecodeError:
                continue
    except ValueError:
        pass
    with open(log_path, "a") as logf:
        logf.write("\n--- stdout ---\n" + out)
    return result


def summarize(results: List[Dict]) -> str:
    lines = [
        "| combo | prefill tok/s | decode tok/s | elapsed | rc |",
        "|---|---|---|---|---|",
    ]
    for r in results:
        rep = (r.get("report") or {}).get("results", {})
        pre = rep.get("best_prefill_tok_s", "-")
        dec = rep.get("decode", {}).get("tok_s_mean", "-")
        lines.append(
            f"| {r['name']} | {pre} | {dec} | {r['elapsed_s']}s | {r['rc']} |"
        )
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("toml", help="suite definition")
    ap.add_argument("--out-dir", default="benchmarks")
    args = ap.parse_args()

    with open(args.toml, "rb") as f:
        spec = tomllib.load(f)
    suite_cfg = spec.get("suite", {})
    combos = spec.get("combo", [])
    log_dir = os.path.join(args.out_dir, "suite_logs")
    os.makedirs(log_dir, exist_ok=True)

    results = []
    for combo in combos:
        print(f"[suite] running {combo.get('name')} ...")
        try:
            results.append(run_combo(combo, suite_cfg, log_dir))
        except subprocess.TimeoutExpired:
            results.append({"name": combo.get("name"), "rc": -1,
                            "elapsed_s": combo.get("timeout_s", 3600)})
    md = summarize(results)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    out = os.path.join(args.out_dir, f"suite_{stamp}.md")
    with open(out, "w") as f:
        f.write(md + "\n")
    print(md)
    print("written:", out)


if __name__ == "__main__":
    main()
