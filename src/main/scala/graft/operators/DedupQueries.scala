package graft.operators
import graft.NamedQuery
object DedupQueries { val all: Seq[NamedQuery] = Seq() }
