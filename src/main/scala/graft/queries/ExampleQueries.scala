package graft.queries

import org.apache.spark.sql.functions._
import QueryDsl._

/** The reference's canonical example pipelines (scio-examples —
  * graft.examples ports) exercised through the oracle gate on the
  * driver's tables: AutoComplete's prefix top-k and
  * TopWikipediaSessions' sessionize-then-top-per-month, each against
  * a full DuckDB recomputation.
  */
object ExampleQueries extends QueryPack {

  override val queries: Map[String, Q] = Map(

    // complete/AutoComplete.scala over the part-name color vocabulary:
    // top-3 completions per prefix (count desc, word tiebreak).
    "q_autocomplete" -> { (s, dir) =>
      val words = tables(s, dir).part
        .select(explode(split(col("p_name"), " ")).as("w"))
      graft.examples.Examples.autoComplete(words, "w", k = 3)
        .select(col("prefix"), col("word"), col("n"), col("rank"))
        .orderBy(col("prefix"), col("rank"))
    },

    // complete/TopWikipediaSessions.scala on the events table: 1-hour
    // gap sessions per user, top session per month of session end.
    "q_wiki_sessions" -> { (s, dir) =>
      graft.examples.Examples.topWikipediaSessions(
          tables(s, dir).events, "user_id", "ts", gap = "1 hour", topPerMonth = 3)
        .select(date_format(col("month"), "yyyy-MM").as("month"),
          col("user").as("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_edits"))
        .orderBy(col("month"), col("n_edits").desc, col("user_id"), col("session_start"))
    }
  )

  override val oracles: Map[String, String] = Map(
    "q_autocomplete" ->
      """WITH w AS (SELECT unnest(string_split(p_name, ' ')) AS word FROM part),
        |c AS (SELECT word, count(*) AS n FROM w WHERE length(word) >= 1 GROUP BY word),
        |p AS (SELECT substr(word, 1, CAST(gs AS INT)) AS prefix, word, n
        |      FROM (SELECT word, n, unnest(generate_series(1, length(word))) AS gs FROM c)),
        |r AS (SELECT prefix, word, n,
        |        CAST(row_number() OVER (PARTITION BY prefix ORDER BY n DESC, word ASC) AS INT) AS rank
        |      FROM p)
        |SELECT prefix, word, n, rank FROM r WHERE rank <= 3
        |ORDER BY prefix, rank""".stripMargin,
    "q_wiki_sessions" ->
      """WITH s AS (SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 1 HOUR THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s),
        |sess AS (SELECT user_id, sid, min(ts) AS session_start,
        |    max(ts) + INTERVAL 1 HOUR AS session_end, count(*) AS n_edits
        |  FROM g GROUP BY 1, 2),
        |m AS (SELECT strftime(date_trunc('month', session_end), '%Y-%m') AS month,
        |    user_id, strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start, n_edits,
        |    row_number() OVER (PARTITION BY date_trunc('month', session_end)
        |      ORDER BY n_edits DESC, user_id ASC, session_start ASC) AS rank
        |  FROM sess)
        |SELECT month, user_id, session_start, n_edits FROM m WHERE rank <= 3
        |ORDER BY month, n_edits DESC, user_id, session_start""".stripMargin
  )
}
