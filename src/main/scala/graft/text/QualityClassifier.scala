package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learned document-quality filter — the trained counterpart of the
  * heuristic quality signals (q18 composite, q38 repetition, q77/q127
  * surprisal): production curation stacks (CCNet-style, fastText-style)
  * score documents with a LINEAR CLASSIFIER over hashed character
  * n-gram features rather than hand-tuned ratios. This is that
  * classifier, built so the entire path is deterministic, RNG-free,
  * and exactly reproducible by a SQL oracle:
  *
  *   - '''Features''': overlapping character trigrams of the
  *     whitespace-normalized lowercased text, hashed into
  *     [[Buckets]] = 65536 buckets via the engine's md5 hex-digit
  *     bucket (four digits — the q37/q212 determinism source extended
  *     two digits; bit-identical in DuckDB, no engine-private hash in
  *     the contract).
  *   - '''Training''': a closed-form class-conditional fit — the
  *     NBSVM-style log-count ratio `log(pos+1) − log(neg+1)` per
  *     bucket — over a fixed labeled fixture of prose vs gibberish.
  *     No SGD, no RNG, no iteration order: the weight vector is a
  *     pure function of the fixture, so rebuilds are bit-stable and
  *     the weights can be spliced into an oracle as literals. The
  *     centering matters: a trigram unseen in EITHER class weighs
  *     exactly 0 (uninformative), where raw naive-Bayes log-odds
  *     would give every unseen trigram the class-size prior and let
  *     corpus-size imbalance decide unknown words.
  *   - '''Scoring''': micro-quantized integer arithmetic (weights are
  *     `round(1e6 · ratio)` longs, only the ~2.4k NONZERO ones
  *     materialized; the document score is the sign-concordant
  *     integer-division mean over its trigram positions — the q161
  *     rule), so Spark and DuckDB agree to the last unit. The sign
  *     IS the sigmoid-at-0.5 decision: mean ≥ 0 ⇔ P(prose) ≥ 0.5.
  *
  * Scale shape: scoring is one codegen'd RELATIONAL pass — explode
  * the trigram positions, ONE md5 + `conv` bucket per position, a
  * sparse literal-map weight lookup, then a doc-grain hash aggregate
  * with map-side partial combine (the only exchange carries one
  * (id, sum, count) row per doc per partition — ids and two longs,
  * never text). No UDF anywhere; everything whole-stage-codegens.
  * A `transform`/`aggregate` HOF formulation was tried first and
  * measured 50× slower at sf0.1: higher-order lambdas are
  * INTERPRETED per element and re-evaluate the md5 subtree per hex
  * digit (no common-subexpression elimination outside codegen) —
  * the q77/shingleRows lesson again. The weight map rides the plan
  * as a literal — the broadcast-variable pattern at its degenerate
  * ~40 KB size.
  */
object QualityClassifier {

  /** Hashed feature-space size: the four-hex-digit md5 bucket both
    * engines compute identically. Wide enough that the fixture's
    * ~2.4k distinct trigrams collide rarely (~4%); collisions that
    * remain are part of the hashing-trick contract (train and score
    * collide identically).
    */
  val Buckets: Int = 65536

  /** The labeled training fixture. Deliberately IN-CODE (not read from
    * a table): the classifier must be a constant of the library, not
    * of the corpus under test — scoring a corpus with weights fit on
    * that same corpus would leak the oracle into the operator.
    * Positive class: natural English prose register (the keep class).
    */
  private[text] val prose: Seq[String] = Seq(
    "The committee reviewed the proposal and agreed to fund the project for another year.",
    "She walked along the river bank watching the light change over the water.",
    "Researchers found that the treatment reduced symptoms in most of the patients studied.",
    "The library opens at nine in the morning and closes at six in the evening.",
    "After the storm passed, the crew spent two days repairing the damaged roof.",
    "Economists expect interest rates to remain stable through the end of the quarter.",
    "The recipe calls for two cups of flour, a pinch of salt, and three eggs.",
    "He finished reading the novel on the train and left it on the seat for a stranger.",
    "Local farmers bring fresh vegetables to the market every Saturday morning.",
    "The museum's new exhibit traces the history of printing from woodblocks to lasers.",
    "Engineers tested the bridge design under loads far beyond normal traffic.",
    "Children played in the park while their parents talked under the old oak tree.",
    "The orchestra rehearsed the symphony twice before the evening performance.",
    "A gentle rain fell through the night and the garden smelled of wet earth by dawn.",
    "The report summarizes three years of field observations across twelve sites.",
    "Volunteers cleared the hiking trail and repainted the markers before the season began.",
    "The bakery on the corner sells out of sourdough loaves within an hour of opening.",
    "Students presented their findings to a panel of teachers and visiting scientists.",
    "The ferry crosses the strait four times a day in summer and twice in winter.",
    "Her latest essay examines how small towns adapt when a major employer leaves.")

  /** Negative class: the junk a web-scale crawl actually yields at the
    * CHARACTER register — keyboard mash, symbol soup, hex dumps,
    * separator runs, and a broad sample of consonant-salad "words"
    * (fixed literals, generated once offline — the fixture itself must
    * stay RNG-free). English-word repetition spam ("free free free
    * buy now") is deliberately NOT in this class: its trigrams are
    * legitimate English, and teaching the register model to hate them
    * would bleed into real prose — repetition is the q38 filter's
    * dimension, and production stacks compose the two cuts.
    */
  private[text] val gibberish: Seq[String] = Seq(
    "asdf jkl qwerty zxcv uiop asdf jkl qwerty zxcv uiop asdf jkl",
    "xjqz vkwp bfgh mtln xjqz vkwp bfgh mtln xjqz vkwp bfgh mtln",
    "aaaaaa bbbbbb cccccc dddddd eeeeee ffffff gggggg hhhhhh iiiiii",
    "%%% $$$ ### @@@ &&& *** ((( ))) ___ +++ === ~~~ ``` ||| ^^^",
    "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq pppp oooo",
    "kqx wvz jfp gdn kqx wvz jfp gdn kqx wvz jfp gdn kqx wvz jfp",
    "0x1f 0x2e 0x3d 0x4c 0x5b 0x6a 0x1f 0x2e 0x3d 0x4c 0x5b 0x6a",
    "qpwoeiruty alskdjfhg zmxncbv qpwoeiruty alskdjfhg zmxncbv",
    "!!!! ???? !!!! ???? !!!! ???? !!!! ???? !!!! ???? !!!! ????",
    "hjkl hjkl hjkl bnm bnm bnm fds fds fds rew rew rew vcx vcx",
    "gfhjk dsert pojnb wqazx gfhjk dsert pojnb wqazx gfhjk dsert",
    "111 222 333 444 555 666 777 888 999 000 111 222 333 444 555",
    "mz pq vx bk dj fw gh ln rt sy mz pq vx bk dj fw gh ln rt sy",
    "fblkk fwd rcbdj vzb jwrks lbhrn gjnf qfp zlcs fqdwm",
    "zpxjd kmd fql phpp ldz hwkhs lwkn kcn ldjx njtqs",
    "lgk wwlxr qpkgv dcfg hrzdq zsvl bfwln mrh blvh fmvzj",
    "phw bzntb pmk kxd tdw gtw lvz jwjm psvs kkd",
    "bxwk kbdck cnd kltjw xxt trj frp rscf qnf jjw",
    "grhl kdsw cwb khr tjqc qbq smrw tgjmj xwc nccxt",
    "vhcvd dzd kqfxk zczdr xxvnl nkl gmsn bsz fdwjv gpdk",
    "mhsw mzvbw fglf wgl zjnj lvtlc rlc ngl swr bfdgw",
    "pxw rgc pcpj kfpwr gkhhr hnr klhfq tkj pmkk jqn",
    "dlpv wnbf hxlc zrp nrzvf xjlc rbvwj rdnz fmvm rnqmw",
    "jrq hzxmq bmmjr znsss jvthd vznd mkj bck zdsr xjqtq",
    "gbf khvs wkf gsvw nszvr shtsl lvt klsdm lnn dggkq",
    "gjdrr wsrc rqx bxqtb mqrw wzktk rtbq qhsg wbqxx bdrgs",
    "clq jsnn lrld bwcp dcb jbz kgt fxjsl hzzf mfx",
    "mxq jdxk mzf cpwrp vnb tfrp sgrhv lzwts xlnk lsk",
    "xzqn tnh jpln zlwb jdkrt kttsb mkq kmxpt vprwn slml",
    "fjn whj tlx zmfjm phm wgl cwm gtfbx ttsn clt",
    "dqt xcg xmd fwr zzkvq smxr xzcz fjjld khw hbr",
    "ztmc mms klx jrfwk glgdc mzx sfsm qlvwt dzcr nzlbd",
    "xxb lxcht slhxr tdtpr nfhn tmqw sdn nfqv wsr jvp",
    "tscjl gmstf zkh wbwr kfs gtm lrttk wgqj vgdlr vlbm",
    "mxxtg wtpn wqsnj kxqkr ntq gtcg xnfsf sbgrg tln qdnwq",
    "twcz kmk drffs mbc cmpp gkvr hhhdz zktx ksl lbsm",
    "whdsp mrlsm qtf qxp mmbql xcz tmkzp jzl gfcms xpg",
    "mnr jgw vvlh tmnf dgkq pdqbl fsplx pfkt zwn kdsmr",
    "gcc tffk gqspw xgrf zrlc pjssk fpwp qlj sdj zbcnk",
    "xjd jxjkn zbl gwl fbg pkx bhlc rvf dtspv fsvkz",
    "vms bctqr ftsdd zgdg zxwn zvms zrffw jrskr sqrf rnlp",
    "tdd drf pgwcx wnfrp rcmzm fxvj tkf wpfl krwzz wbzlb",
    "lmn bhgx qdgbd vjqrs hpmn zdcgh cdlsr zsrl vfp fmxt",
    "mckqz bjm glm fbtr gqw kvwpd crbs nxr qrmfq nhz",
    "pdrf rxq dqmnk hdvf vjppg fgl hzg dhtsx sxznn sdt",
    "mlxc vdms ccpm dzz qsxwc xjnz vgcs ndv hckss vzhpp",
    "qrnz ndn wqm zgnd gpmqg dmwqn vdr pbpmh ntj ggd",
    "fvwv nzg qghhz scr kszm skwkm jpxs mqvv hjzg ctpw",
    "vfm hls grdks brcq pkqdp bnf nggcm gtsz dbl gwz",
    "rfmkm ckr zsdft wbvxk gmrbz kxrh dvpdv vvwbq cqpl bpdpk",
    "fxngc wnhs thgds mjc cnm qwtlc jmpcn fprq sqnht tpvld",
    "rdrzh mnfdn mmszr sps pzr cdqp hbgzs gdk ppqxc gspps",
    "xgv qnlk bht qwfll sjzmt fgd hsdn pdwwm hhpv fjg")

  /** The engine-wide text normalization (shingleRows parity): lowercase,
    * collapse all whitespace runs to single spaces, trim.
    */
  private def normalize(text: String): String =
    text.toLowerCase.replaceAll("\\s+", " ").trim

  /** md5 four-hex-digit bucket of a trigram — the Scala twin of the
    * SQL expression both engines score with.
    */
  private[text] def bucketOf(gram: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Byte.toUnsignedInt(d(0)) * 256 + java.lang.Byte.toUnsignedInt(d(1))
  }

  private def trigrams(text: String): Seq[String] = {
    val n = normalize(text)
    if (n.length < 3) Seq.empty else (0 to n.length - 3).map(i => n.substring(i, i + 3))
  }

  /** The trained SPARSE weight map: per bucket seen in the fixture,
    * `round(1e6 · (log(pos+1) − log(neg+1)))`, zero entries dropped
    * (an absent bucket scores 0 — see the centering note in the
    * object doc). Computed once at class-load — microseconds of
    * driver work, bit-stable forever.
    */
  val weightsMicro: Map[Long, Long] = {
    def counts(docs: Seq[String]): Map[Int, Long] = {
      val c = scala.collection.mutable.Map.empty[Int, Long]
      docs.foreach(t => trigrams(t).foreach { g =>
        val b = bucketOf(g); c(b) = c.getOrElse(b, 0L) + 1
      })
      c.toMap
    }
    val pos = counts(prose)
    val neg = counts(gibberish)
    (pos.keySet ++ neg.keySet).iterator.map { b =>
      b.toLong -> math.round(
        (math.log(pos.getOrElse(b, 0L) + 1.0) - math.log(neg.getOrElse(b, 0L) + 1.0)) * 1e6)
    }.filter(_._2 != 0L).toMap
  }

  /** Score `docs(idCol, textCol)` → (idCol, n_grams, score_micro,
    * label): score_micro is the sign-concordant integer mean of the
    * per-trigram-position bucket weights (0 for docs shorter than one
    * trigram), label is 'keep' iff score_micro ≥ 0 (the log-ratio
    * decision boundary). One map-side projection — see object doc.
    */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = expr(s"trim(regexp_replace(lower($textCol), '\\\\s+', ' '))")
    val base = docs
      .select(col(idCol), norm.as("_qn"))
      .withColumn("_n", greatest(length(col("_qn")) - 2, lit(0)).cast("long"))
    // one md5 per gram; the first 4 hex digits as an integer are
    // exactly the four-strpos arithmetic the oracle states
    val bucket =
      "cast(conv(substring(md5(_g), 1, 4), 16, 10) as int)"
    // DENSE weight vector for the plan literal: element_at on an
    // array is O(1) positional access, where a map literal is a
    // linear scan of its entries PER LOOKUP (measured 2402-entry map:
    // ~5× the whole query's runtime at sf0.1).
    val dense: IndexedSeq[Long] =
      (0 until Buckets).map(b => weightsMicro.getOrElse(b.toLong, 0L))
    // gram extraction is ONE regex pass per doc (the shingleRows
    // zero-width-lookahead technique at char grain), exploded to rows
    // that carry ONLY the 3-char gram — a position-index explode must
    // drag the whole normalized text through every output row
    // (measured ~40% of the query at sf0.1)
    val scored = base.filter(col("_n") > 0)
      .select(col(idCol),
        explode(expr("regexp_extract_all(_qn, '(?=(.{3}))', 1)")).as("_g"))
      .withColumn("_qw", typedLit(dense))
      .select(col(idCol),
        expr(s"element_at(_qw, $bucket + 1)").as("_w"))
      .groupBy(col(idCol))
      .agg(sum(col("_w")).as("_qs"), count(lit(1)).as("n_grams"))
    val empty = base.filter(col("_n") === 0)
      .select(col(idCol), lit(0L).as("_qs"), lit(0L).as("n_grams"))
    scored.unionByName(empty)
      .withColumn("score_micro",
        when(col("n_grams") === 0, lit(0L))
          .when(col("_qs") >= 0, expr("_qs div n_grams"))
          .otherwise(expr("-((-_qs) div n_grams)")))
      .withColumn("label", when(col("score_micro") >= 0, lit("keep")).otherwise(lit("cut")))
      .select(col(idCol), col("n_grams"), col("score_micro"), col("label"))
  }

  /** DuckDB SQL reproducing [[score]] exactly over the `documents`
    * table: the sparse weight map is spliced in as a VALUES relation
    * (LEFT-joined — an absent bucket weighs 0, matching the map's
    * coalesce), trigrams come from an unnest(range(...)) lateral, and
    * the bucket/mean arithmetic mirrors the Spark expressions
    * operator-for-operator.
    */
  def oracleSql: String = {
    val values = weightsMicro.toSeq.sorted
      .map { case (b, w) => s"($b,$w)" }.mkString(",")
    s"""WITH w(b, wt) AS (VALUES $values),
       |n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
       |      FROM documents),
       |g AS (SELECT doc_id,
       |        substr(norm, CAST(unnest(range(1, greatest(length(norm)-2, 0) + 1)) AS INT), 3) AS gram
       |      FROM n),
       |gb AS (SELECT doc_id,
       |         (strpos('0123456789abcdef', substr(md5(gram),1,1))-1)*4096
       |         + (strpos('0123456789abcdef', substr(md5(gram),2,1))-1)*256
       |         + (strpos('0123456789abcdef', substr(md5(gram),3,1))-1)*16
       |         + (strpos('0123456789abcdef', substr(md5(gram),4,1))-1) AS b
       |       FROM g),
       |s AS (SELECT doc_id, SUM(COALESCE(wt, 0)) AS ssum, COUNT(*) AS cnt
       |      FROM gb LEFT JOIN w USING (b) GROUP BY doc_id)
       |SELECT n.doc_id,
       |  CAST(COALESCE(s.cnt, 0) AS BIGINT) AS n_grams,
       |  CAST(CASE WHEN COALESCE(s.cnt, 0) = 0 THEN 0
       |            WHEN s.ssum >= 0 THEN s.ssum // s.cnt
       |            ELSE -((-s.ssum) // s.cnt) END AS BIGINT) AS score_micro,
       |  CASE WHEN CAST(CASE WHEN COALESCE(s.cnt, 0) = 0 THEN 0
       |            WHEN s.ssum >= 0 THEN s.ssum // s.cnt
       |            ELSE -((-s.ssum) // s.cnt) END AS BIGINT) >= 0
       |       THEN 'keep' ELSE 'cut' END AS label
       |FROM n LEFT JOIN s USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }
}
