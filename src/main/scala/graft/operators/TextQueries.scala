package graft.operators
import graft.NamedQuery
object TextQueries { val all: Seq[NamedQuery] = Seq() }
