"""Dump a catalog query's .explain('formatted') to plans/<dir>/<q>_<tag>.txt.

Usage: python scripts/dump_plan.py r14 after multimodal_image_ahash_neardup [...]
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    rdir, tag, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from meerschaum_spark.session import get_spark
    import __spark_entry__ as entrymod
    spark = get_spark("dump_plan")
    qs = entrymod.queries()
    out_dir = os.path.join(REPO, "plans", rdir)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{name}: {len(txt.splitlines())} lines, {n_ex} Exchange "
              f"-> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
