"""Scripting: XML object scripts, path controllers, batched pure-function
object animation (Winter-equivalent), event handlers + timers
(Luau-equivalent).

Reference surface: gui_client/Scripting.{h,cpp} (parseXMLScript, vehicle
script settings, parallel Winter eval), gui_client/ObjectPathController.*,
gui_client/ObjectMoveToController.*, shared/LuaScriptEvaluator.* +
shared/SubstrataLuaVM.* + shared/ObjectEventHandlers.* +
shared/ScriptTimerQueue.*.
"""

from substrata_tpu.scripting.xml_scripts import parse_xml_script  # noqa: F401
from substrata_tpu.scripting.path_controller import ObjectPathController  # noqa: F401
from substrata_tpu.scripting.winter import (  # noqa: F401
    WinterScriptEvaluator, ObjectScriptsEvaluator,
)
from substrata_tpu.scripting.events import (  # noqa: F401
    ObjectEventHandlers, ScriptTimerQueue, ScriptVM,
)
