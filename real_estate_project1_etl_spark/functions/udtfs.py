"""Python UDTFs (table functions) — the third user-function surface next
to Column expressions and Arrow-batched map/grouped-map Pandas UDFs.

The reference has no UDTF concept (its row expanders are pandas loops,
reference: extract.py:17-40); Spark 4's ``@udtf`` gives a lateral-join
table function callable from both the DataFrame API and SQL
(``LATERAL split_sentences(text)``). Everything here is declared with
``useArrow=True`` so the exec node is ``ArrowEvalPythonUDTF`` — the
Arrow-batched Python lane the repo's plan lint sanctions (row-at-a-time
``BatchEvalPythonUDTF`` is the slow path, same policy as UDFs).

Determinism contract: the sentence-split rule is defined BY the code
below — an explicit ASCII-whitespace class, an explicit strip set, a
capture-group rewrite instead of lookbehind — precisely so a SQL engine
without lookbehind support (RE2-based DuckDB) can reproduce it
expression-for-expression. The oracle of ``sentence_split_docs`` does.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

#: ASCII whitespace class shared by the UDTF and its SQL mirror (RE2's \s
#: and Python's \s disagree on unicode/\v — an explicit class doesn't)
_WS = " \t\n\r\f"
_BOUNDARY = re.compile(r"([.!?])[ \t\n\r\f]+")
_SEP = "\x1e"  # ASCII record separator — never in document text


@udtf(returnType="idx int, sentence string", useArrow=True)
class SplitSentences:
    """text -> (idx, sentence) rows: split after sentence-final
    punctuation followed by whitespace; strip; drop empties; index the
    surviving sentences in order."""

    def eval(self, text: str):
        if text is None:
            return
        marked = _BOUNDARY.sub("\\1" + _SEP, text)
        out = 0
        for part in marked.split(_SEP):
            s = part.strip(_WS)
            if s:
                yield out, s
                out += 1


def register_udtfs(spark) -> None:
    """Expose the table functions to the SQL surface (idempotent)."""
    spark.udtf.register("split_sentences", SplitSentences)
