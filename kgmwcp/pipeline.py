class Pipeline: pass
class PipelineConfig: pass
