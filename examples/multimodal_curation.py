"""Multimodal corpus curation walkthrough — the round-6 media stack.

The pipeline a training-data team runs over a mixed media drop:
ingest binaries, REAL-decode them with the pure-stdlib codecs
(PNG/BMP/JPEG incl. progressive, WAV, MPEG-1 Layer I/II), extract
typed features, then near-dup each modality with its own perceptual
fingerprint — pHash (32x32 DCT low-band signs) for images, afp56
(log-Hz band occupancy) for audio — through the SAME banded Hamming
join that powers the text simhash family. Ends with the text-side
survivors selection to show the three modalities sharing one dedup
vocabulary.

Run:  python examples/multimodal_curation.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from magictables_spark.plans.queries import REGISTRY
from magictables_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("multimodal_curation_example")
    spark.sparkContext.setLogLevel("ERROR")

    def run(slug: str, n: int = 12) -> None:
        print(f"\n=== {slug} ===")
        REGISTRY[slug].fn(spark, sf_dir).show(n, truncate=False)

    # 1. decode + featurize the committed media corpus per mime
    run("multimodal_features")

    # 2. image near-dups: every JPEG re-encode / brightness variant
    #    pairs with its base; cross-content pairs stay >= 20 bits away
    run("image_phash_neardup", 20)

    # 3. audio near-dups: a REAL MPEG-1 Layer II round-trip and a gain
    #    change both land at Hamming ~0 from their source WAV
    run("audio_fp_neardup", 20)

    # 4. the text twin, and the O(n)-output survivor selection that a
    #    production dedup actually materializes
    run("simhash_neardup")
    run("simhash_dedup_survivors")

    spark.stop()


if __name__ == "__main__":
    main()
