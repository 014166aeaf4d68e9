"""spark-submit entry point (north rule deployment path).

Run the checkpointed, resumable extraction job on a cluster:

    spark-submit --py-files material_parsers_spark.zip \
        -m material_parsers_spark run \
        --input  s3://bucket/turns/          (or a local parquet dir)
        --output s3://bucket/extractions/
        --manifest /shared/manifests/run42
        --run-id run42 --buckets 256

or locally for smoke testing:

    python -m material_parsers_spark run --generate 10000 \
        --output /tmp/out --manifest /tmp/manifest --run-id dev

Re-running with the same manifest resumes: completed buckets are skipped
via a broadcast anti-join (pipeline/checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="material_parsers_spark")
    sub = parser.add_subparsers(dest="command", required=True)

    run = sub.add_parser("run", help="checkpointed extraction job")
    run.add_argument("--input", help="turns parquet dir (conv_id, turn_idx, "
                                     "role, text, tool, ts)")
    run.add_argument("--generate", type=int, default=0,
                     help="generate N synthetic turns instead of --input")
    run.add_argument("--output", required=True)
    run.add_argument("--manifest", required=True)
    run.add_argument("--run-id", required=True)
    run.add_argument("--buckets", type=int, default=64)
    run.add_argument("--master", default=None)

    stream = sub.add_parser("stream", help="drain a turns stream once")
    stream.add_argument("--input", required=True)
    stream.add_argument("--output", required=True)
    stream.add_argument("--checkpoint", required=True)
    stream.add_argument("--master", default=None)

    web = sub.add_parser(
        "web", help="HTML turns -> boilerplate strip -> material "
                    "extraction (pipeline/web.py)")
    web.add_argument("--input", help="turns parquet dir whose text "
                                     "column holds HTML fragments")
    web.add_argument("--generate", type=int, default=0,
                     help="generate N synthetic turns wrapped in the "
                          "deterministic page skeleton")
    web.add_argument("--output", required=True)
    web.add_argument("--master", default=None)

    tag = sub.add_parser(
        "tag", help="batched tagging stage only (pipeline/inference.py); "
                    "swap the payload in code for a trained model")
    tag.add_argument("--input", help="turns parquet dir")
    tag.add_argument("--generate", type=int, default=0)
    tag.add_argument("--output", required=True)
    tag.add_argument("--max-sequence-length", type=int, default=3000)
    tag.add_argument("--batch-size", type=int, default=32)
    tag.add_argument("--master", default=None)

    args = parser.parse_args(argv)

    from .pipeline.session import build_session

    spark = build_session(app_name=f"mps-{args.command}", master=args.master)

    if args.command == "run":
        from .pipeline.checkpoint import run_with_checkpoint
        from .pipeline.transcripts import generate_turns

        if args.generate:
            turns = generate_turns(spark, args.generate)
        elif args.input:
            turns = spark.read.parquet(args.input)
        else:
            parser.error("provide --input or --generate")
        lineage = run_with_checkpoint(
            turns, args.output, args.manifest, args.run_id,
            n_buckets=args.buckets)
        print(json.dumps(lineage))
        return 0

    if args.command == "stream":
        from .streaming.turn_stream import run_stream_once
        run_stream_once(spark, args.input, args.output, args.checkpoint)
        print(json.dumps({"status": "drained", "output": args.output}))
        return 0

    if args.command == "web":
        from .pipeline.transcripts import generate_turns
        from .pipeline.web import (
            extract_materials_from_html,
            wrap_turns_in_html,
        )

        if args.generate:
            turns = wrap_turns_in_html(generate_turns(spark, args.generate))
        elif args.input:
            turns = spark.read.parquet(args.input)
        else:
            parser.error("provide --input or --generate")
        extract_materials_from_html(turns).write.mode("overwrite") \
            .parquet(args.output)
        print(json.dumps({"status": "extracted", "output": args.output}))
        return 0

    if args.command == "tag":
        from .pipeline.inference import tag_turns
        from .pipeline.transcripts import generate_turns

        if args.generate:
            turns = generate_turns(spark, args.generate)
        elif args.input:
            turns = spark.read.parquet(args.input)
        else:
            parser.error("provide --input or --generate")
        tagged = tag_turns(turns.select("conv_id", "turn_idx", "text"),
                           max_sequence_length=args.max_sequence_length,
                           batch_size=args.batch_size)
        tagged.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"status": "tagged", "output": args.output}))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
