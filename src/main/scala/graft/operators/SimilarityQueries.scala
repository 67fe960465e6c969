package graft.operators
import graft.NamedQuery
object SimilarityQueries { val all: Seq[NamedQuery] = Seq() }
