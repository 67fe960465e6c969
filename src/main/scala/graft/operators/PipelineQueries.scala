package graft.operators
import graft.NamedQuery
object PipelineQueries { val all: Seq[NamedQuery] = Seq() }
