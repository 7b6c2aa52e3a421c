#!/usr/bin/env python3
"""Generate N synthetic INMET station CSVs for ingest scale probes.

Each file is a faithful instance of the dual-section micro-format
(8 metadata K/V rows; 19-column ';' header; decimal-comma data rows with
trailing ';'), templated from the A507 fixture with a unique station
code/WMO per file and D days of hourly rows. Probe input only — never an
oracle fixture.

Usage: python3 tools/gen_inmet_files.py <outDir> <nFiles> [daysPerFile=14]
"""
import os
import sys

TEMPLATE = "/root/repo/src/test/resources/inmet/INMET_SE_MG_A507_UBERLANDIA.csv"


def main(out_dir, n, days):
    lines = open(TEMPLATE, encoding="latin-1").read().splitlines()
    header_meta, col_header = lines[:8], lines[8]
    data = [l for l in lines[9:] if l.strip()]
    per_day = 24
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n):
        code = f"Z{i:04d}"
        meta = list(header_meta)
        meta[2] = f"ESTACAO:;SYNTH{i:04d}"
        meta[3] = f"CODIGO (WMO):;{code}"
        rows = data[:days * per_day]
        with open(f"{out_dir}/INMET_SE_MG_{code}_SYNTH{i:04d}.csv", "w",
                  encoding="latin-1") as f:
            f.write("\n".join(meta) + "\n" + col_header + "\n")
            f.write("\n".join(rows) + "\n")
    print(f"{out_dir}: {n} files x {days * per_day} rows")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]),
         int(sys.argv[3]) if len(sys.argv) > 3 else 14)
