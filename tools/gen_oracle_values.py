#!/usr/bin/env python3
"""Dev-only: freeze the reference parser's fixture output (make_expected.py)
into DuckDB literal-VALUES oracle SQL, emitted as DiscogsOracles.scala.

The flattening here must mirror Discogs.scala exactly: list items joined
'|', struct fields ';', inner descriptions ',', nulls as '∅'.
"""
import json
import subprocess
import sys

NUL = "∅"
OUT = "/root/repo/src/main/scala/graft/operators/DiscogsOracles.scala"


def sq(v):
    if v is None:
        return "NULL"
    return "'" + str(v).replace("'", "''") + "'"


def lit(v, typ=None):
    if v is None:
        base = "NULL"
    elif isinstance(v, bool):
        base = "true" if v else "false"
    elif isinstance(v, (int, float)):
        base = str(v)
    else:
        base = sq(v)
    return f"CAST({base} AS {typ})" if typ else base


def jlist(arr):
    return "|".join(NUL if x is None else str(x) for x in arr)


def field(v):
    if v is None:
        return NUL
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def jstructs(arr, fields, inner_list=None):
    out = []
    for d in arr:
        parts = []
        for f in fields:
            if inner_list and f == inner_list:
                parts.append(",".join(NUL if x is None else str(x) for x in d[f]))
            else:
                parts.append(field(d[f]))
        out.append(";".join(parts))
    return "|".join(out)


def values_sql(cols, rows, order_by):
    lines = []
    for i, row in enumerate(rows):
        typed = [lit(v, t if i == 0 else None) for (_, t), v in zip(cols, row)]
        lines.append("  (" + ", ".join(typed) + ")")
    names = ", ".join(n for n, _ in cols)
    return ("SELECT * FROM (VALUES\n" + ",\n".join(lines) +
            f"\n) AS t({names}) ORDER BY {order_by}")


def main():
    exp = json.loads(subprocess.run(
        [sys.executable, "/root/repo/tools/make_expected.py"],
        capture_output=True, text=True, check=True).stdout)

    def img(d, wf):
        o = ["width", "height"] if wf else ["height", "width"]
        return ";".join(field(d[k]) for k in o + ["type", "uri", "uri150"])

    def jimgs(arr, wf):
        return "|".join(img(d, wf) for d in arr)

    # q01 artists
    a_cols = [("id", "BIGINT"), ("name", "VARCHAR"), ("realname", "VARCHAR"),
              ("profile", "VARCHAR"), ("data_quality", "VARCHAR"),
              ("urls_s", "VARCHAR"), ("n_urls", "INTEGER"),
              ("namevariations_s", "VARCHAR"), ("aliases_s", "VARCHAR"),
              ("groups_s", "VARCHAR"), ("members_s", "VARCHAR"),
              ("images_s", "VARCHAR"), ("n_images", "INTEGER")]
    a_rows = [[r["id"], r["name"], r["realname"], r["profile"], r["data_quality"],
               jlist(r["urls"]), len(r["urls"]),
               jlist(r["namevariations"]), jlist(r["aliases"]),
               jlist(r["groups"]), jlist(r["members"]),
               jimgs(r["images"], False), len(r["images"])]
              for r in sorted(exp["artist"], key=lambda r: r["id"])]
    q01 = values_sql(a_cols, a_rows, "id")

    # q02 labels
    l_cols = [("id", "BIGINT"), ("name", "VARCHAR"), ("contactinfo", "VARCHAR"),
              ("profile", "VARCHAR"), ("data_quality", "VARCHAR"),
              ("images_s", "VARCHAR"), ("n_images", "INTEGER"),
              ("urls_s", "VARCHAR"), ("n_urls", "INTEGER"),
              ("sublabels_s", "VARCHAR")]
    l_rows = [[r["id"], r["name"], r["contactinfo"], r["profile"], r["data_quality"],
               jimgs(r["images"], True), len(r["images"]),
               jlist(r["urls"]), len(r["urls"]), jlist(r["sublabels"])]
              for r in sorted(exp["label"], key=lambda r: r["id"])]
    q02 = values_sql(l_cols, l_rows, "id")

    # q03 masters
    m_cols = [("id", "BIGINT"), ("main_release", "BIGINT"), ("artists_s", "VARCHAR"),
              ("genres_s", "VARCHAR"), ("styles_s", "VARCHAR"), ("year", "INTEGER"),
              ("title", "VARCHAR"), ("data_quality", "VARCHAR"),
              ("images_s", "VARCHAR"), ("videos_s", "VARCHAR")]
    m_rows = [[r["id"], r["main_release"],
               jstructs(r["artists"], ["id", "name", "anv", "join", "role", "tracks"]),
               jlist(r["genres"]), jlist(r["styles"]), r["year"], r["title"],
               r["data_quality"], jimgs(r["images"], False),
               jstructs(r["videos"], ["duration", "embed", "src", "title", "description"])]
              for r in sorted(exp["master"], key=lambda r: r["id"])]
    q03 = values_sql(m_cols, m_rows, "id")

    # q04 releases
    r_cols = [("id", "BIGINT"), ("status", "VARCHAR"), ("title", "VARCHAR"),
              ("country", "VARCHAR"), ("released", "VARCHAR"), ("notes", "VARCHAR"),
              ("images_s", "VARCHAR"), ("artists_s", "VARCHAR"),
              ("labels_s", "VARCHAR"), ("formats_s", "VARCHAR"),
              ("genres_s", "VARCHAR"), ("styles_s", "VARCHAR")]
    r_rows = [[r["id"], r["status"], r["title"], r["country"], r["released"],
               r["notes"], jimgs(r["images"], False), jlist(r["artists"]),
               jstructs(r["labels"], ["name", "catno"]),
               jstructs(r["formats"], ["name", "qty", "descriptions"],
                        inner_list="descriptions"),
               jlist(r["genres"]), jlist(r["styles"])]
              for r in sorted(exp["release"], key=lambda r: r["id"])]
    q04 = values_sql(r_cols, r_rows, "id")

    # q05: README Jazz query over the parsed releases.
    jazz = [(r["id"], r["title"]) for r in sorted(exp["release"], key=lambda r: r["id"])
            if "Jazz" in r["genres"] and len(r["genres"]) > 1][:20]
    q05 = values_sql([("id", "BIGINT"), ("title", "VARCHAR")], jazz, "id")

    # q06: exploded genre counts.
    counts = {}
    for r in exp["release"]:
        for g in r["genres"]:
            counts[g] = counts.get(g, 0) + 1
    q06 = values_sql([("genre", "VARCHAR"), ("n", "BIGINT")],
                     sorted(counts.items()), "genre")

    # q0m: manifest expected output (derived by the reference's rules from
    # manifest_keys.txt + checksum_contents.txt).
    base = "https://discogs-data-dumps.s3.us-west-2.amazonaws.com"
    q0m_rows = [
        ["2019-01", "artist", f"{base}/data/2019/discogs_20190115_artists.xml.gz",
         "ccc333", "2019-01-15"],
        ["2019-01", "label", f"{base}/data/2019/discogs_20190101_labels.xml.gz",
         "ddd444", "2019-01-01"],
        ["2019-02", "master", f"{base}/data/2019/discogs_20190214_masters.xml.gz",
         "", "2019-02-14"],
        ["2019-02", "release", f"{base}/data/2019/discogs_20190201_releases.xml.gz",
         "", "2019-02-01"],
    ]
    q0m = values_sql([("year_month", "VARCHAR"), ("data_type", "VARCHAR"),
                      ("url", "VARCHAR"), ("checksum", "VARCHAR"),
                      ("date", "VARCHAR")], q0m_rows, "year_month, data_type")

    # q0l: lake roundtrip — month '04' partition only: 6 releases,
    # sum(size(genres)).
    n_genres = sum(len(r["genres"]) for r in exp["release"])
    q0l = values_sql([("year", "INTEGER"), ("month", "VARCHAR"),
                      ("n", "BIGINT"), ("n_genres", "BIGINT")],
                     [[1996, "04", len(exp["release"]), n_genres]], "year, month")

    defs = {"q01": q01, "q02": q02, "q03": q03, "q04": q04,
            "q05": q05, "q06": q06, "q0m": q0m, "q0l": q0l}
    body = "\n\n".join(
        f"  val {k}: String =\n    \"\"\"{v}\"\"\"" for k, v in defs.items())
    with open(OUT, "w") as f:
        f.write(
            "package graft.operators\n\n"
            "/** GENERATED by tools/gen_oracle_values.py — DuckDB VALUES oracles\n"
            "  * frozen from the REFERENCE parser's output on the XML fixtures\n"
            "  * (tools/make_expected.py executes /root/reference's parser).\n"
            "  * Regenerate after changing fixtures; do not edit by hand.\n"
            "  */\n"
            "object DiscogsOracles {\n" + body + "\n}\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
