from cvd_tpu.pipelines.simple import SimplePipeline
from cvd_tpu.pipelines.advanced import AdvancedPipeline
from cvd_tpu.pipelines.common import PipelineModules
