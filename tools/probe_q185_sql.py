#!/usr/bin/env python
"""Draft probe for the q185 composed-ingest oracle: runs the chained
DuckDB SQL standalone and prints verdict-class counts, so the quality
gate / thresholds can be tuned to keep every class LIVE at sf0.01
before the query is wired into the registry."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def q185_sql(num_hashes: int = 64, bands: int = 8,
             sim_threshold: float = 0.7, min_words: int = 20,
             emb_threshold: float = 0.35) -> str:
    import math

    from solar_data_tools_spark.operators.dedup import (
        _P31,
        md5_u31_constants,
    )

    consts = md5_u31_constants(num_hashes)
    r = num_hashes // bands
    min_equal = math.ceil(sim_threshold * num_hashes)
    mins = ",\n         ".join(
        f"min(({a} * x0 + {b} * x1 + {c}) % {_P31}) AS s{i}"
        for i, (a, b, c) in enumerate(consts)
    )

    def band_eq(x: str, y: str) -> str:
        return " OR ".join(
            "("
            + " AND ".join(
                f"{x}.s{b * r + j} = {y}.s{b * r + j}" for j in range(r)
            )
            + ")"
            for b in range(bands)
        )

    def n_equal(x: str, y: str) -> str:
        return " + ".join(
            f"(CASE WHEN {x}.s{i} = {y}.s{i} THEN 1 ELSE 0 END)"
            for i in range(num_hashes)
        )

    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    cos = (
        "list_dot_product({a}.v, {b}.v) / sqrt(list_dot_product({a}.v, "
        "{a}.v) * list_dot_product({b}.v, {b}.v))"
    )
    return f"""
WITH mid AS (SELECT (max(doc_id) + 1) // 2 AS m FROM documents),
qual AS (
  SELECT d.doc_id, d.text,
         len(regexp_split_to_array({norm}, ' ')) >= {min_words} AS ok
  FROM documents d, mid WHERE d.doc_id >= mid.m
),
ex AS (SELECT doc_id, text, md5({norm}) AS h FROM qual WHERE ok),
sth AS (
  SELECT DISTINCT md5({norm}) AS h
  FROM documents, mid WHERE doc_id < mid.m
),
firsts AS (SELECT h, min(doc_id) AS first_id FROM ex GROUP BY h),
exv AS (
  SELECT e.doc_id, e.text, e.h,
         CASE WHEN s.h IS NOT NULL THEN 'exact_history_dup'
              WHEN e.doc_id > f.first_id THEN 'exact_snapshot_dup'
         END AS ev,
         CASE WHEN s.h IS NULL AND e.doc_id > f.first_id
              THEN f.first_id END AS em
  FROM ex e LEFT JOIN sth s ON e.h = s.h
  JOIN firsts f ON e.h = f.h
),
base AS (
  SELECT d.doc_id, d.text FROM documents d, mid WHERE d.doc_id < mid.m
  UNION ALL
  SELECT doc_id, text FROM exv WHERE ev IS NULL
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array({norm}, ' ')) AS shingle
  FROM base
),
shx AS (
  SELECT doc_id,
         ('0x' || substring(md5(shingle), 1, 7))::BIGINT AS x0,
         ('0x' || substring(md5(shingle), 9, 7))::BIGINT AS x1
  FROM sh
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM shx GROUP BY doc_id
),
histm AS (
  SELECT n.doc_id AS doc_id, min(h.doc_id) AS m
  FROM sig n, sig h, mid
  WHERE n.doc_id >= mid.m AND h.doc_id < mid.m
    AND ({band_eq('n', 'h')})
    AND ({n_equal('n', 'h')}) >= {min_equal}
  GROUP BY n.doc_id
),
snapm AS (
  SELECT b.doc_id AS doc_id, min(a.doc_id) AS m
  FROM sig a, sig b, mid
  WHERE a.doc_id >= mid.m AND b.doc_id >= mid.m
    AND a.doc_id < b.doc_id
    AND ({band_eq('a', 'b')})
    AND ({n_equal('a', 'b')}) >= {min_equal}
  GROUP BY b.doc_id
),
mhv AS (
  SELECT e.doc_id,
         CASE WHEN hm.m IS NOT NULL THEN 'minhash_history_dup'
              WHEN sm.m IS NOT NULL THEN 'minhash_snapshot_dup'
         END AS mv,
         coalesce(hm.m, sm.m) AS mm
  FROM exv e
  LEFT JOIN histm hm ON hm.doc_id = e.doc_id
  LEFT JOIN snapm sm ON sm.doc_id = e.doc_id
  WHERE e.ev IS NULL
),
mk AS (SELECT doc_id FROM mhv WHERE mv IS NULL),
ev_ AS (
  SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
),
enew AS (SELECT e.doc_id, e.v FROM ev_ e JOIN mk ON mk.doc_id = e.doc_id),
estore AS (SELECT e.doc_id, e.v FROM ev_ e, mid WHERE e.doc_id < mid.m),
smch AS (
  SELECT n.doc_id AS doc_id, min(s.doc_id) AS m
  FROM enew n, estore s
  WHERE {cos.format(a='n', b='s')} >= {emb_threshold}
  GROUP BY n.doc_id
),
bmch AS (
  SELECT b.doc_id AS doc_id, min(a.doc_id) AS m
  FROM enew a, enew b
  WHERE a.doc_id < b.doc_id
    AND {cos.format(a='a', b='b')} >= {emb_threshold}
  GROUP BY b.doc_id
),
emv AS (
  SELECT mk.doc_id,
         CASE WHEN sc.m IS NOT NULL THEN 'embedding_store_dup'
              WHEN bc.m IS NOT NULL THEN 'embedding_batch_dup'
         END AS evd,
         coalesce(sc.m, bc.m) AS emm
  FROM mk
  LEFT JOIN smch sc ON sc.doc_id = mk.doc_id
  LEFT JOIN bmch bc ON bc.doc_id = mk.doc_id
)
SELECT q.doc_id,
       CASE WHEN NOT q.ok THEN 'quality_rejected'
            WHEN x.ev IS NOT NULL THEN x.ev
            WHEN m.mv IS NOT NULL THEN m.mv
            WHEN e2.evd IS NOT NULL THEN e2.evd
            ELSE 'new' END AS verdict,
       CASE WHEN NOT q.ok THEN NULL
            WHEN x.ev IS NOT NULL THEN x.em
            WHEN m.mv IS NOT NULL THEN m.mm
            ELSE e2.emm END AS matched_id,
       (q.ok AND x.ev IS NULL AND m.mv IS NULL AND e2.evd IS NULL)
         AS keep,
       CASE WHEN q.ok THEN x.h END AS content_md5
FROM qual q
LEFT JOIN exv x ON x.doc_id = q.doc_id
LEFT JOIN mhv m ON m.doc_id = q.doc_id
LEFT JOIN emv e2 ON e2.doc_id = q.doc_id
"""


if __name__ == "__main__":
    import duckdb

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    sql = q185_sql()
    print(
        con.sql(
            f"SELECT verdict, count(*) n FROM ({sql}) "
            "GROUP BY verdict ORDER BY verdict"
        ).df()
    )
    print(con.sql(f"SELECT count(*) FROM ({sql})").fetchall())
