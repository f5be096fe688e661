#!/usr/bin/env python3
"""Dev harness: build the non-ASCII gate corpus (r15 evidence, now a
checked-in tool instead of an ad-hoc snippet).

Copies every sf table and rewrites documents.text, suffixing every 7th
word with a cycling non-ASCII char (Latin-1 accents, CJK, an astral
emoji, and a sharp s — one representative per UTF-8 width class), so the
whole oracle gate re-runs on genuinely multi-byte text. Deterministic:
same input -> same corpus.

Usage: python3 tools/naify_corpus.py [srcDir] [dstDir]
       (defaults: /root/testdata/sf0.001 target/na_corpus)
NOT part of the library — pyarrow is a driver-side tool only.
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
CHARS = ["é", "ü", "日", "語", "😀", "ß"]


def naify(text: str) -> str:
    words = text.split(" ")
    return " ".join(
        w + CHARS[(i // 7) % len(CHARS)] if i % 7 == 6 else w
        for i, w in enumerate(words))


def main(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        s, d = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
        if t != "documents":
            shutil.copyfile(s, d)
            continue
        tbl = pq.read_table(s)
        texts = [naify(x) for x in tbl.column("text").to_pylist()]
        cols = {name: tbl.column(name) for name in tbl.column_names}
        cols["text"] = pa.array(texts, type=pa.string())
        pq.write_table(pa.table(cols), d)
    print(f"non-ASCII corpus written to {dst}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
         sys.argv[2] if len(sys.argv) > 2 else "target/na_corpus")
