"""Convert an image directory (or mnist.npz) into a mmap-able shard store.

    python tools/make_shards.py <image_dir> <out_dir> [--resolution 128]
                                [--shard_size 4096] [--num_examples N]

Decodes once (native parallel loader) into ``<out_dir>/shard-*.npy``; training
runs then pass ``--data_dir <out_dir>`` (or drop it at
``$DATASETS_DIR/celeba_shards_<res>`` for auto-discovery by ``load_celeba``)
and stream with zero decode cost and OS-page-cache residency
(`data/pipeline.py::ShardedArrayDataset`). Conversion is bounded-memory: one
shard decodes at a time.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("source", help="directory of images, or an mnist.npz")
    p.add_argument("out_dir", help="empty output directory for shard-*.npy")
    # Sentinel default (round-4 ADVICE): argparse accepts unambiguous prefix
    # abbreviations ('--res 64'), so sniffing sys.argv for the literal flag
    # missed those and silently sharded at the wrong size. None = unset; the
    # image-dir default (128) is resolved below. Also keeps main() correct
    # when invoked programmatically with a synthetic argv.
    p.add_argument("--resolution", type=int, default=None,
                   help="centre-crop + resize target for image dirs "
                        "(default 128; unsupported for mnist.npz)")
    p.add_argument("--shard_size", type=int, default=4096,
                   help="examples per shard file")
    p.add_argument("--num_examples", type=int, default=None,
                   help="cap the number of source images")
    args = p.parse_args()

    from blurred_gan_tpu.data.pipeline import (ImageFolderDataset,
                                               load_mnist, write_shards)

    if os.path.isdir(args.source):
        src = ImageFolderDataset(args.source,
                                 128 if args.resolution is None
                                 else args.resolution,
                                 num_examples=args.num_examples)
    elif args.source.endswith(".npz"):
        # mnist.npz arrives at its native 28²; --resolution only applies to
        # image dirs, so a conflicting value is an error, not a silent no-op.
        if args.resolution is not None and args.resolution != 28:
            raise SystemExit(
                f"--resolution {args.resolution} is unsupported for "
                f"mnist.npz sources (images are stored at their native "
                f"28x28); omit the flag")
        src = load_mnist(args.source, allow_synthetic_fallback=False)
        if args.num_examples:
            from blurred_gan_tpu.data.pipeline import ArrayDataset

            src = ArrayDataset(src.images[:args.num_examples], name=src.name)
    else:
        raise SystemExit(f"unsupported source: {args.source}")

    ds = write_shards(src, args.out_dir, shard_size=args.shard_size)
    print(f"[make_shards] wrote {ds.num_examples} examples "
          f"({ds.image_shape[0]}x{ds.image_shape[1]}x{ds.image_shape[2]}) "
          f"to {args.out_dir}")


if __name__ == "__main__":
    main()
