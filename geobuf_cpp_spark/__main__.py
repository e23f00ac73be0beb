"""Engine CLI — ``python -m geobuf_cpp_spark <subcommand>``.

File-oriented codec subcommands mirror the reference CLI
(reference pybind11_geobuf/__main__.py:135-147: json2geobuf / geobuf2json /
normalize_json / normalize_geobuf / pbf_decode); the job subcommands are
the spark-submit entry points of the distributed engine.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="geobuf_cpp_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("json2geobuf", help="GeoJSON file -> geobuf pbf file")
    p.add_argument("input"), p.add_argument("output")
    p.add_argument("--precision", type=int, default=8)
    p.add_argument("--simplify", type=float, default=None, metavar="EPS",
                   help="Douglas-Peucker tolerance applied before encode")

    p = sub.add_parser("geobuf2json", help="geobuf pbf file -> GeoJSON file")
    p.add_argument("input"), p.add_argument("output")
    p.add_argument("--indent", action="store_true")
    p.add_argument("--sort-keys", action="store_true")

    p = sub.add_parser("normalize_json", help="canonicalize a JSON file")
    p.add_argument("input"), p.add_argument("output")

    p = sub.add_parser("normalize_geobuf", help="decode -> re-encode a pbf")
    p.add_argument("input"), p.add_argument("output")
    p.add_argument("--precision", type=int, default=8)

    p = sub.add_parser("pbf_decode", help="schema-less debug dump of a pbf")
    p.add_argument("input")

    p = sub.add_parser("pipeline", help="pages -> extract+encode -> PIP join job")
    p.add_argument("--pages", type=int, default=10000)
    p.add_argument("--out", required=True, help="output/checkpoint root")

    p = sub.add_parser(
        "curate",
        help="documents -> dedup+quality -> decontaminate -> sample job")
    p.add_argument("--docs",
                   default="/root/testdata/sf0.001/documents.parquet")
    p.add_argument("--out", required=True, help="output/checkpoint root")
    p.add_argument("--rate", type=float, default=0.5,
                   help="per-language keep rate for the final sample")

    p = sub.add_parser("bench", help="run the benchmark harness")

    args = ap.parse_args(argv)

    if args.cmd == "json2geobuf":
        from .codec import geobuf as gb
        from .codec.jsonio import load_json

        doc = load_json(args.input)
        if args.simplify is not None:
            from .operators.simplify import simplify_geojson

            doc = simplify_geojson(doc, args.simplify)
        data = gb.encode(doc, max_precision=10**args.precision)
        with open(args.output, "wb") as f:
            f.write(data)
        print(f"wrote {len(data)} bytes")
    elif args.cmd == "geobuf2json":
        from .codec import geobuf as gb

        with open(args.input, "rb") as f:
            doc = gb.decode(f.read())
        with open(args.output, "w") as f:
            json.dump(doc, f, indent=4 if args.indent else None,
                      sort_keys=args.sort_keys, ensure_ascii=False)
        print(f"wrote {args.output}")
    elif args.cmd == "normalize_json":
        from .codec import geobuf as gb
        from .codec.jsonio import load_json

        doc = load_json(args.input)
        with open(args.output, "w") as f:
            f.write(gb.normalize_json(doc))
        print(f"wrote {args.output}")
    elif args.cmd == "normalize_geobuf":
        from .codec import geobuf as gb

        with open(args.input, "rb") as f:
            data = f.read()
        out = gb.normalize_geobuf(data, max_precision=10**args.precision)
        with open(args.output, "wb") as f:
            f.write(out)
        print(f"{len(data)} -> {len(out)} bytes")
    elif args.cmd == "pbf_decode":
        from .codec.pbf_debug import to_printable

        with open(args.input, "rb") as f:
            print(to_printable(f.read()))
    elif args.cmd == "pipeline":
        from .functions.udfs import extract_encode_features
        from .operators.pip_join import pip_join
        from .plans.manifest import fingerprint, run_stage
        from .session import get_spark
        from .sources.pages import generate_admin_polygons, pages_dataframe

        spark = get_spark("pipeline")
        fp = fingerprint("pages", str(args.pages))
        pages = run_stage(
            spark, args.out, "pages", fp,
            lambda: pages_dataframe(spark, args.pages),
        )
        encoded = run_stage(
            spark, args.out, "features", fingerprint(fp, "extract+encode"),
            lambda: extract_encode_features(pages),
        )
        admin = generate_admin_polygons()
        joined = run_stage(
            spark, args.out, "pip", fingerprint(fp, "pip", str(len(admin))),
            lambda: pip_join(
                encoded.select("url", "feature_idx", "lon", "lat"), admin, res=8
            ),
        )
        print(f"pipeline complete: {joined.count()} PIP matches under {args.out}")
        spark.stop()
    elif args.cmd == "curate":
        # The end-to-end training-data curation recipe, checkpointed at
        # every stage boundary (same manifest contract as `pipeline`):
        # quality+lang+dedup filter -> test-set decontamination ->
        # deterministic stratified sample. Re-running with the same
        # inputs resumes instantly from the manifests.
        from pyspark.sql import functions as F

        from .operators.curation import stratified_sample
        from .operators.dedup import decontaminate, exact_dedup
        from .operators.textstats import lang_signal, quality_score
        from .plans.manifest import fingerprint, run_stage
        from .session import get_spark

        spark = get_spark("curate")
        docs = spark.read.parquet(args.docs)
        fp = fingerprint("curate", args.docs)

        def build_clean():
            quality = quality_score(docs).filter("keep = 1").select("doc_id")
            lang = lang_signal(docs).filter("pred_en = 1").select("doc_id")
            keepers = exact_dedup(docs).select(
                F.col("keeper_id").alias("doc_id"))
            return docs.join(quality, "doc_id").join(lang, "doc_id").join(
                keepers, "doc_id")

        clean = run_stage(spark, args.out, "clean", fp, build_clean)
        heldout = docs.where("doc_id % 13 = 0")
        decon = run_stage(
            spark, args.out, "decontam", fingerprint(fp, "mod13"),
            lambda: decontaminate(clean, heldout),
        )
        langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
        sampled = run_stage(
            spark, args.out, "sample",
            fingerprint(fp, "rate", str(args.rate)),
            lambda: stratified_sample(
                decon, {lg: args.rate for lg in langs}),
        )
        n0, n1, n2, n3 = (docs.count(), clean.count(), decon.count(),
                          sampled.count())
        print(f"curate complete: {n0} -> clean {n1} -> decontam {n2} "
              f"-> sample {n3} under {args.out}")
        spark.stop()
    elif args.cmd == "bench":
        import runpy

        runpy.run_module("bench", run_name="__main__")
    return 0


if __name__ == "__main__":
    sys.exit(main())
