#!/usr/bin/env python3
"""Extract the reference dataset's COPY blocks into TSV fixtures.

Reads /root/reference/BookOrdersDatabaseDump_17.sql (pg_dump; COPY ... FROM
stdin blocks are tab-separated with \\N for NULL) and writes one TSV per
table to src/test/resources/bookorders/. Data only — no code is copied.
char(n) blank padding is stripped (stored-trimmed decision, SURVEY §7.1).
"""
import re
from pathlib import Path

SRC = Path("/root/reference/BookOrdersDatabaseDump_17.sql")
OUT = Path("/root/repo/src/test/resources/bookorders")


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    text = SRC.read_text()
    blocks = re.findall(
        r"^COPY (?:public\.)?(\w+) \(([^)]*)\) FROM stdin;\n(.*?)^\\\.$",
        text, re.M | re.S)
    for table, cols, body in blocks:
        rows = []
        for line in body.rstrip("\n").split("\n"):
            fields = [f.strip() if f != "\\N" else "\\N"
                      for f in line.split("\t")]
            rows.append("\t".join(fields))
        (OUT / f"{table}.tsv").write_text("\n".join(rows) + "\n")
        print(f"{table}: {len(rows)} rows ({cols})")


if __name__ == "__main__":
    main()
