#!/usr/bin/env python3
"""Dev-only: generate a large artists XML dump (deterministic) to measure
ingest throughput. Usage: gen_ingest_bench.py <n_records> <out.xml[.gz]>
"""
import gzip
import sys


def main():
    n, out = int(sys.argv[1]), sys.argv[2]
    op = gzip.open(out, "wt", encoding="utf-8") if out.endswith(".gz") \
        else open(out, "w", encoding="utf-8")
    with op as f:
        f.write("<artists>\n")
        for i in range(1, n + 1):
            urls = "".join(f"<url>https://example.com/a{i}/{j}</url>"
                           for j in range(i % 4))
            aliases = "".join(f"<name>alias {i} {j}</name>" for j in range(i % 3))
            images = "".join(
                f'<image height="{100 + i % 500}" width="{100 + (i * 7) % 500}" '
                f'type="primary" uri="u{i}" uri150="v{i}"/>'
                for _ in range(i % 2))
            f.write(
                f"<artist><id>{i}</id><name>Artist Number {i}</name>"
                f"<realname>Real  Name\n{i}</realname>"
                f"<profile>Profile text for artist {i} with some   spaced words "
                f"and a second sentence to pad the record out.</profile>"
                f"<data_quality>Correct</data_quality>"
                f"<urls>{urls}</urls><aliases>{aliases}</aliases>"
                f"<images>{images}</images></artist>\n")
        f.write("</artists>\n")
    print(f"wrote {out}: {n} records")


if __name__ == "__main__":
    main()
