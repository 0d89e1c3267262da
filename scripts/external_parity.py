"""Push-button external parity runbook (VERDICT r4 #7).

This image has no network egress and no Cython, so the five BASELINE.json
head-to-head configs cannot run HERE — this script is the committed,
tested recipe for an environment that has both. It:

1. ``--fetch``: downloads the public datasets (ML-100k, ML-1M, Gowalla
   check-ins, Amazon-Beauty ratings; Yelp needs a manual license download)
   and preprocesses each with the skrx Preprocessor into the shared
   on-disk split format BOTH sides read (same
   ``<name>_<split>_u<min>_i<min>/*.{train,valid,test,user2id,item2id}``
   contract as reference skrec/io/preprocessor.py:286-334).
2. ``--build-reference``: copies ``--reference`` (default /root/reference)
   to the workdir, ``pip install cython`` and builds its extensions
   in-place (``python setup.py build_ext --inplace``).
3. ``--run``: for each config, runs the reference's ``run_skrec.py`` and
   skrx's ``run_skrx.py`` with the SAME pinned seed, metric=(Recall,NDCG),
   top_k=(20,), and evaluator batch settings, parses each side's best
   epoch from its log, and prints the BASELINE.md table rows
   (skrx/reference ratios on Recall@20 and NDCG@20).

Usage (network + Cython environment):

    python scripts/external_parity.py --workdir /tmp/extparity \
        --fetch --build-reference --run --configs bprmf multvae lightgcn sasrec

The plumbing (URL table, extraction, preprocessing args, command
construction, log parsing) is unit-tested with a mocked fetch in
tests/test_external_parity.py, so the runbook stays executable.
"""
import argparse
import gzip
import io
import os
import re
import shutil
import subprocess
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------------------
# dataset table: url, archive member -> raw rating file, column layout
# ---------------------------------------------------------------------------

DATASETS = {
    "ml-100k": {
        "url": "https://files.grouplens.org/datasets/movielens/ml-100k.zip",
        "member": "ml-100k/u.data",
        "sep": "\t", "columns": "UIRT",
        "user_min": 5, "item_min": 5,
    },
    "ml-1m": {
        "url": "https://files.grouplens.org/datasets/movielens/ml-1m.zip",
        "member": "ml-1m/ratings.dat",
        "sep": "::", "columns": "UIRT",
        "user_min": 5, "item_min": 5,
    },
    "gowalla": {
        "url": "https://snap.stanford.edu/data/loc-gowalla_totalCheckins.txt.gz",
        "member": None,   # gzip single file: user, check-in time, lat, lon, loc
        "sep": "\t", "columns": "UTXXI",  # remapped below to UIT
        "user_min": 10, "item_min": 10,
    },
    "amazon-beauty": {
        "url": "https://snap.stanford.edu/data/amazon/productGraph/"
               "categoryFiles/ratings_Beauty.csv",
        "member": None,
        "sep": ",", "columns": "UIRT",
        "user_min": 5, "item_min": 5,
    },
    "yelp": {
        "url": None,  # license-gated: download yelp_academic_dataset manually,
                      # convert reviews to "user<TAB>item<TAB>stars<TAB>ts"
        "member": None,
        "sep": "\t", "columns": "UIRT",
        "user_min": 10, "item_min": 10,
    },
}

# the five BASELINE.json head-to-head configs (model flags pinned on both
# sides; seeds/evaluator settings shared)
CONFIGS = {
    "bprmf": dict(dataset="ml-100k", recommender="BPRMF",
                  flags={"lr": 1e-3, "reg": 1e-3, "n_dim": 64,
                         "batch_size": 1024, "epochs": 500,
                         "early_stop": 100}),
    "multvae": dict(dataset="ml-1m", recommender="MultVAE",
                    flags={"lr": 1e-3, "batch_size": 256, "epochs": 200,
                           "early_stop": 50}),
    "lightgcn": dict(dataset="gowalla", recommender="LightGCN",
                     flags={"lr": 1e-3, "reg": 1e-3, "embed_size": 64,
                            "n_layers": 3, "batch_size": 2048,
                            "epochs": 1000, "early_stop": 100}),
    "sasrec": dict(dataset="amazon-beauty", recommender="SASRec",
                   flags={"lr": 1e-3, "hidden_units": 64, "max_len": 50,
                          "num_blocks": 2, "num_heads": 1,
                          "batch_size": 128, "epochs": 400,
                          "early_stop": 100}),
    "lightgcl_dens": dict(dataset="yelp", recommender="LightGCL",
                          flags={"lr": 1e-3, "d": 64, "gnn_layer": 2,
                                 "svd_q": 5, "batch_size": 2048,
                                 "epochs": 500, "early_stop": 100},
                          extra=("DENS", {"lr": 1e-3, "dim": 64,
                                          "context_hops": 2, "K": 1,
                                          "n_negs": 16, "ns": "dens",
                                          "batch_size": 2048,
                                          "epochs": 500,
                                          "early_stop": 100})),
}

SEED = 2021
EVAL_FLAGS = {"metric": "('Recall','NDCG')", "top_k": "(20,)",
              "test_batch_size": 64}


# ---------------------------------------------------------------------------
# plumbing (unit-tested with a mocked fetch)
# ---------------------------------------------------------------------------

def fetch_raw(name, dest_dir, opener=None):
    """Download + extract dataset ``name``'s raw rating file into
    ``dest_dir``; returns the raw file path. ``opener(url) -> bytes``
    overrides the network call (tests)."""
    spec = DATASETS[name]
    os.makedirs(dest_dir, exist_ok=True)
    raw_path = os.path.join(dest_dir, name + ".raw")
    if os.path.exists(raw_path):        # incl. manually placed (yelp)
        return raw_path
    if spec["url"] is None:
        raise RuntimeError(
            f"{name}: license-gated — place the converted rating file at "
            f"{raw_path} manually")
    if opener is None:
        from urllib.request import urlopen

        def opener(url):
            with urlopen(url) as r:
                return r.read()
    blob = opener(spec["url"])
    if spec["url"].endswith(".zip"):
        with zipfile.ZipFile(io.BytesIO(blob)) as z:
            data = z.read(spec["member"])
    elif spec["url"].endswith(".gz"):
        data = gzip.decompress(blob)
    else:
        data = blob
    if name == "gowalla":   # (user, time, lat, lon, loc) -> user, item, time
        out = []
        for line in data.decode().splitlines():
            p = line.split("\t")
            if len(p) == 5:
                out.append(f"{p[0]}\t{p[4]}\t{p[1]}")
        data = ("\n".join(out) + "\n").encode()
    with open(raw_path, "wb") as f:
        f.write(data)
    return raw_path


def preprocess(name, raw_path, out_root):
    """Split the raw file with the skrx Preprocessor (same on-disk contract
    as the reference's) — by_time 70/10/20, contiguous id remap. Returns
    the split dir both sides read."""
    from skrx.io import Preprocessor

    spec = DATASETS[name]
    columns = "UIT" if name == "gowalla" else spec["columns"]
    sep = "\t" if name == "gowalla" else spec["sep"]
    p = Preprocessor()
    p.load_data(raw_path, sep=sep, columns=columns)
    p.drop_duplicates(keep="last")
    p.filter_data(user_min=spec["user_min"], item_min=spec["item_min"])
    p.remap_data_id()
    p.split_data_by_ratio(train=0.7, valid=0.1, test=0.2,
                          by_time=("T" in columns))
    p.save_data(out_root)
    dirs = [d for d in os.listdir(out_root)
            if os.path.isdir(os.path.join(out_root, d))]
    assert dirs, "preprocessor produced no split dir"
    return os.path.join(out_root, sorted(dirs)[-1])


def build_reference(reference_src, workdir):
    """Copy the reference tree (the source checkout is read-only) and build
    its Cython extensions in-place."""
    dst = os.path.join(workdir, "reference_build")
    if not os.path.exists(dst):
        shutil.copytree(reference_src, dst)
    subprocess.run([sys.executable, "-m", "pip", "install", "cython"],
                   check=True)
    subprocess.run([sys.executable, "setup.py", "build_ext", "--inplace"],
                   cwd=dst, check=True)
    return dst


def side_command(driver, recommender, data_dir, flags, file_column, sep):
    """The exact CLI invocation for one side (shared flag contract)."""
    cmd = [sys.executable, driver, "--recommender", recommender,
           "--data_dir", data_dir, "--file_column", file_column,
           "--sep", sep, "--seed", str(SEED)]
    for k, v in {**EVAL_FLAGS, **flags}.items():
        cmd += [f"--{k}", str(v)]
    return cmd


_METRIC_ROW = re.compile(r"(\d+\.\d+)")


def parse_best(log_text):
    """(Recall@20, NDCG@20) of the best-NDCG epoch from either side's log
    (both print tab-separated per-epoch metric rows in (Recall, NDCG)
    order and a final 'best' row)."""
    best = None
    for line in log_text.splitlines():
        low = line.lower()
        if "best" in low:
            nums = [float(x) for x in _METRIC_ROW.findall(line)]
            if len(nums) >= 2:
                best = (nums[0], nums[1])
    if best is None:  # fall back: best NDCG over epoch rows
        rows = []
        for line in log_text.splitlines():
            if "epoch" in line.lower():
                nums = [float(x) for x in _METRIC_ROW.findall(line)]
                if len(nums) >= 2:
                    rows.append((nums[0], nums[1]))
        assert rows, "no metric rows found in log"
        best = max(rows, key=lambda t: t[1])
    return best


def run_config(key, split_dir, reference_dir, repo_dir, log_dir):
    """Run both sides of one config; returns the BASELINE.md table row."""
    cfg = CONFIGS[key]
    spec = DATASETS[cfg["dataset"]]
    file_column = "UIT" if cfg["dataset"] == "gowalla" else "UIRT"
    rows = []
    models = [(cfg["recommender"], cfg["flags"])]
    if "extra" in cfg:
        models.append(cfg["extra"])
    for rec, flags in models:
        results = {}
        for side, driver, cwd in (
                ("skrx", os.path.join(repo_dir, "run_skrx.py"), repo_dir),
                ("ref", os.path.join(reference_dir, "run_skrec.py"),
                 reference_dir)):
            cmd = side_command(driver, rec, split_dir, flags,
                               file_column, "\\t")
            out = subprocess.run(cmd, cwd=cwd, capture_output=True,
                                 text=True, check=True)
            log = out.stdout + out.stderr
            with open(os.path.join(log_dir,
                                   f"{key}_{rec}_{side}.log"), "w") as f:
                f.write(log)
            results[side] = parse_best(log)
        (s_rec, s_ndcg), (r_rec, r_ndcg) = results["skrx"], results["ref"]
        rows.append(f"| {key}/{rec} | {r_ndcg:.4f} | {s_ndcg:.4f} | "
                    f"{s_ndcg / r_ndcg:.2f} | {r_rec:.4f} | {s_rec:.4f} | "
                    f"{s_rec / r_rec:.2f} |")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--repo", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--configs", nargs="+", default=list(CONFIGS))
    ap.add_argument("--fetch", action="store_true")
    ap.add_argument("--build-reference", action="store_true")
    ap.add_argument("--run", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    log_dir = os.path.join(args.workdir, "logs")
    os.makedirs(log_dir, exist_ok=True)
    splits = {}
    for key in args.configs:
        ds = CONFIGS[key]["dataset"]
        if ds in splits:
            continue
        out_root = os.path.join(args.workdir, "data", ds)
        if args.fetch:
            raw = fetch_raw(ds, os.path.join(args.workdir, "raw"))
            splits[ds] = preprocess(ds, raw, out_root)
            print(f"[{ds}] split at {splits[ds]}")
        elif os.path.isdir(out_root):   # staged runbook: resume a prior
            dirs = sorted(d for d in os.listdir(out_root)  # --fetch's output
                          if os.path.isdir(os.path.join(out_root, d)))
            if dirs:
                splits[ds] = os.path.join(out_root, dirs[-1])
                print(f"[{ds}] reusing split at {splits[ds]}")
    ref_dir = None
    if args.build_reference:
        ref_dir = build_reference(args.reference, args.workdir)
        print(f"[reference] built at {ref_dir}")
    if args.run:
        assert ref_dir, "--run needs --build-reference (or a prior build)"
        missing = [k for k in args.configs
                   if CONFIGS[k]["dataset"] not in splits]
        assert not missing, (
            f"no split data for {missing}: run with --fetch first "
            f"(splits are then reused from --workdir on later invocations)")
        print("| config | ref NDCG@20 | skrx | ratio | ref Recall@20 "
              "| skrx | ratio |")
        print("|---|---|---|---|---|---|---|")
        for key in args.configs:
            for row in run_config(key, splits[CONFIGS[key]["dataset"]],
                                  ref_dir, args.repo, log_dir):
                print(row)


if __name__ == "__main__":
    main()
