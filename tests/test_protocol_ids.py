"""Id-for-id parity test against the reference's shared/Protocol.h values.

Every constant here is transcribed from /root/reference/shared/Protocol.h
(version 54).  If this test fails, either the reference moved or someone
broke wire parity — protocol.py's module docstring claims message-id parity,
so this is the measuring stick for that claim (VERDICT round 1 found seven
wrong ids; this pins all of them).
"""

from substrata_tpu.net import protocol as P

# (python_name, reference_name, Protocol.h value)
REFERENCE_IDS = [
    ("CYBERSPACE_HELLO", "CyberspaceHello", 1357924680),
    ("CYBERSPACE_PROTOCOL_VERSION", "CyberspaceProtocolVersion", 54),
    ("CLIENT_PROTOCOL_OK", "ClientProtocolOK", 10000),
    ("CLIENT_PROTOCOL_TOO_OLD", "ClientProtocolTooOld", 10001),
    ("CLIENT_PROTOCOL_TOO_NEW", "ClientProtocolTooNew", 10002),
    ("CLIENT_UDP_SOCKET_OPEN", "ClientUDPSocketOpen", 10003),
    ("CYBERSPACE_GOODBYE", "CyberspaceGoodbye", 10010),
    ("AUDIO_STREAM_TO_SERVER_STARTED", "AudioStreamToServerStarted", 10020),
    ("AUDIO_STREAM_TO_SERVER_ENDED", "AudioStreamToServerEnded", 10021),
    ("CONNECTION_TYPE_UPDATES", "ConnectionTypeUpdates", 500),
    ("CONNECTION_TYPE_UPLOAD_RESOURCE", "ConnectionTypeUploadResource", 501),
    ("CONNECTION_TYPE_DOWNLOAD_RESOURCES", "ConnectionTypeDownloadResources", 502),
    ("CONNECTION_TYPE_SCREENSHOT_BOT", "ConnectionTypeScreenshotBot", 504),
    ("CONNECTION_TYPE_ETH_BOT", "ConnectionTypeEthBot", 505),
    ("CONNECTION_TYPE_UPLOAD_PHOTO", "ConnectionTypeUploadPhoto", 506),
    ("CHANGE_TO_DIFFERENT_WORLD", "ChangeToDifferentWorld", 600),
    ("AVATAR_CREATED", "AvatarCreated", 1000),
    ("AVATAR_DESTROYED", "AvatarDestroyed", 1001),
    ("AVATAR_TRANSFORM_UPDATE", "AvatarTransformUpdate", 1002),
    ("AVATAR_FULL_UPDATE", "AvatarFullUpdate", 1003),
    ("CREATE_AVATAR", "CreateAvatar", 1004),
    ("AVATAR_IS_HERE", "AvatarIsHere", 1005),
    ("AVATAR_PERFORM_GESTURE", "AvatarPerformGesture", 1010),
    ("AVATAR_STOP_GESTURE", "AvatarStopGesture", 1011),
    ("AVATAR_ENTERED_VEHICLE", "AvatarEnteredVehicle", 1100),
    ("AVATAR_EXITED_VEHICLE", "AvatarExitedVehicle", 1101),
    ("AVATAR_SAT_ON_SEAT", "AvatarSatOnSeat", 1110),
    ("AVATAR_GOT_UP_FROM_SEAT", "AvatarGotUpFromSeat", 1111),
    ("USER_MOVED_NEAR_TO_AVATAR", "UserMovedNearToAvatar", 1200),
    ("USER_MOVED_AWAY_FROM_AVATAR", "UserMovedAwayFromAvatar", 1201),
    ("USER_GESTURE_SETTINGS_CHANGED", "UserGestureSettingsChanged", 1300),
    ("QUERY_USER_GEAR", "QueryUserGear", 1400),
    ("USER_GEAR_LIST", "UserGearList", 1401),
    ("GEAR_ITEM_UPDATE", "GearItemUpdate", 1402),
    ("CREATE_GEAR_ITEM", "CreateGearItem", 1403),
    ("PICK_UP_GEAR_ITEM", "PickUpGearItem", 1404),
    ("DROP_GEAR_ITEM", "DropGearItem", 1405),
    ("CLONE_GEAR_ITEM_IN_INVENTORY", "CloneGearItemInInventory", 1406),
    ("CHAT_MESSAGE_ID", "ChatMessageID", 2000),
    ("OBJECT_CREATED", "ObjectCreated", 3000),
    ("OBJECT_DESTROYED", "ObjectDestroyed", 3001),
    ("OBJECT_TRANSFORM_UPDATE", "ObjectTransformUpdate", 3002),
    ("OBJECT_FULL_UPDATE", "ObjectFullUpdate", 3003),
    ("CREATE_OBJECT", "CreateObject", 3004),
    ("DESTROY_OBJECT", "DestroyObject", 3005),
    ("OBJECT_LIGHTMAP_URL_CHANGED", "ObjectLightmapURLChanged", 3010),
    ("OBJECT_FLAGS_CHANGED", "ObjectFlagsChanged", 3011),
    ("OBJECT_MODEL_URL_CHANGED", "ObjectModelURLChanged", 3012),
    ("OBJECT_PHYSICS_OWNERSHIP_TAKEN", "ObjectPhysicsOwnershipTaken", 3013),
    ("OBJECT_PHYSICS_TRANSFORM_UPDATE", "ObjectPhysicsTransformUpdate", 3016),
    ("OBJECT_CONTENT_CHANGED", "ObjectContentChanged", 3017),
    ("OBJECT_MOVE_TO", "ObjectMoveTo", 3018),
    ("OBJECT_ROTATE_TO", "ObjectRotateTo", 3019),
    ("SUMMON_OBJECT", "SummonObject", 3030),
    ("MOVE_TO_EASING_LINEAR", "MoveTo_EasingLinear", 0),
    ("MOVE_TO_EASING_SMOOTHSTEP", "MoveTo_EasingSmoothstep", 1),
    ("QUERY_OBJECTS", "QueryObjects", 3020),
    ("OBJECT_INITIAL_SEND", "ObjectInitialSend", 3021),
    ("QUERY_OBJECTS_IN_AABB", "QueryObjectsInAABB", 3022),
    ("OBJECT_INITIAL_SEND_COMPRESSED", "ObjectInitialSendCompressed", 3023),
    ("PARCEL_CREATED", "ParcelCreated", 3100),
    ("PARCEL_DESTROYED", "ParcelDestroyed", 3101),
    ("PARCEL_FULL_UPDATE", "ParcelFullUpdate", 3103),
    ("PARCEL_INITIAL_SEND_COMPRESSED", "ParcelInitialSendCompressed", 3104),
    ("QUERY_PARCELS", "QueryParcels", 3150),
    ("PARCEL_LIST", "ParcelList", 3160),
    ("GET_ALL_OBJECTS", "GetAllObjects", 3600),
    ("ALL_OBJECTS_SENT", "AllObjectsSent", 3601),
    ("WORLD_SETTINGS_INITIAL_SEND_MESSAGE", "WorldSettingsInitialSendMessage", 3700),
    ("WORLD_SETTINGS_UPDATE", "WorldSettingsUpdate", 3701),
    ("WORLD_DETAILS_INITIAL_SEND_MESSAGE", "WorldDetailsInitialSendMessage", 3750),
    ("QUERY_MAP_TILES", "QueryMapTiles", 3800),
    ("MAP_TILES_RESULT", "MapTilesResult", 3801),
    ("QUERY_LOD_CHUNKS_MESSAGE", "QueryLODChunksMessage", 3900),
    ("LOD_CHUNK_INITIAL_SEND", "LODChunkInitialSend", 3901),
    ("LOD_CHUNK_UPDATED_MESSAGE", "LODChunkUpdatedMessage", 3902),
    ("GET_FILE", "GetFile", 4000),
    ("GET_FILES", "GetFiles", 4001),
    ("NEW_RESOURCE_ON_SERVER", "NewResourceOnServer", 4100),
    ("UPLOAD_ALLOWED", "UploadAllowed", 5100),
    ("LOG_IN_FAILURE", "LogInFailure", 5101),
    ("INVALID_FILE_SIZE", "InvalidFileSize", 5102),
    ("NO_WRITE_PERMISSIONS", "NoWritePermissions", 5103),
    ("SERVER_IS_IN_READ_ONLY_MODE", "ServerIsInReadOnlyMode", 5104),
    ("INVALID_FILE_TYPE", "InvalidFileType", 5105),
    ("USER_SELECTED_OBJECT", "UserSelectedObject", 6000),
    ("USER_DESELECTED_OBJECT", "UserDeselectedObject", 6001),
    ("USER_USED_OBJECT_MESSAGE", "UserUsedObjectMessage", 6500),
    ("USER_TOUCHED_OBJECT_MESSAGE", "UserTouchedObjectMessage", 6501),
    ("USER_MOVED_NEAR_TO_OBJECT_MESSAGE", "UserMovedNearToObjectMessage", 6510),
    ("USER_MOVED_AWAY_FROM_OBJECT_MESSAGE", "UserMovedAwayFromObjectMessage", 6511),
    ("USER_ENTERED_PARCEL_MESSAGE", "UserEnteredParcelMessage", 6512),
    ("USER_EXITED_PARCEL_MESSAGE", "UserExitedParcelMessage", 6513),
    ("INFO_MESSAGE_ID", "InfoMessageID", 7001),
    ("ERROR_MESSAGE_ID", "ErrorMessageID", 7002),
    ("SERVER_ADMIN_MESSAGE_ID", "ServerAdminMessageID", 7010),
    ("LOG_IN_MESSAGE", "LogInMessage", 8000),
    ("LOG_OUT_MESSAGE", "LogOutMessage", 8001),
    ("SIGN_UP_MESSAGE", "SignUpMessage", 8002),
    ("LOGGED_IN_MESSAGE_ID", "LoggedInMessageID", 8003),
    ("LOGGED_OUT_MESSAGE_ID", "LoggedOutMessageID", 8004),
    ("SIGNED_UP_MESSAGE_ID", "SignedUpMessageID", 8005),
    ("REQUEST_PASSWORD_RESET", "RequestPasswordReset", 8010),
    ("CHANGE_PASSWORD_WITH_RESET_TOKEN", "ChangePasswordWithResetToken", 8011),
    ("TIME_SYNC_MESSAGE", "TimeSyncMessage", 9000),
    ("SCREENSHOT_REQUEST", "ScreenShotRequest", 11001),
    ("SCREENSHOT_SUCCEEDED", "ScreenShotSucceeded", 11002),
    ("TILE_SCREENSHOT_REQUEST", "TileScreenShotRequest", 11003),
    ("GEAR_SCREENSHOT_REQUEST", "GearScreenShotRequest", 11004),
    ("SUBMIT_ETH_TRANSACTION_REQUEST", "SubmitEthTransactionRequest", 12001),
    ("ETH_TRANSACTION_SUBMITTED", "EthTransactionSubmitted", 12002),
    ("ETH_TRANSACTION_SUBMISSION_FAILED", "EthTransactionSubmissionFailed", 12003),
    ("KEEP_ALIVE", "KeepAlive", 13000),
    ("PING", "PingMessage", 13100),
    ("PONG", "PongMessage", 13101),
    ("PHOTO_UPLOAD_SUCCEEDED", "PhotoUploadSucceeded", 14000),
    ("PHOTO_UPLOAD_FAILED", "PhotoUploadFailed", 14001),
    ("BUILDER_AI_USER_MESSAGE", "BuilderAIUserMessage", 15000),
    ("BUILDER_AI_CANCEL", "BuilderAICancel", 15001),
    ("BUILDER_AI_TEXT_DELTA", "BuilderAITextDelta", 15010),
    ("BUILDER_AI_TOOL_ACTIVITY", "BuilderAIToolActivity", 15011),
    ("BUILDER_AI_TURN_COMPLETE", "BuilderAITurnComplete", 15012),
    ("BUILDER_AI_ERROR", "BuilderAIError", 15013),
    ("STREAMING_COMPRESSED_OBJECT_SUPPORT", "STREAMING_COMPRESSED_OBJECT_SUPPORT", 0x1),
    ("SENDS_USER_MOVED_CHATBOT_MSGS", "SENDS_USER_MOVED_CHATBOT_MSGS", 0x2),
    ("OBJECT_TEXTURE_BASISU_SUPPORT", "OBJECT_TEXTURE_BASISU_SUPPORT", 0x1),
    ("TERRAIN_DETAIL_MAPS_BASISU_SUPPORT", "TERRAIN_DETAIL_MAPS_BASISU_SUPPORT", 0x2),
    ("OPTIMISED_MESH_SUPPORT", "OPTIMISED_MESH_SUPPORT", 0x4),
]


def test_every_reference_id_matches():
    bad = []
    for py_name, ref_name, value in REFERENCE_IDS:
        got = getattr(P, py_name, None)
        if got != value:
            bad.append(f"{py_name} ({ref_name}): have {got}, Protocol.h says {value}")
    assert not bad, "\n".join(bad)


def test_no_duplicate_message_ids():
    """Message-id families must not collide (capability bitmasks excluded —
    they share a numeric space by design)."""
    exclude = {
        "CYBERSPACE_PROTOCOL_VERSION", "MOVE_TO_EASING_LINEAR",
        "MOVE_TO_EASING_SMOOTHSTEP",
        "STREAMING_COMPRESSED_OBJECT_SUPPORT", "SENDS_USER_MOVED_CHATBOT_MSGS",
        "OBJECT_TEXTURE_BASISU_SUPPORT", "TERRAIN_DETAIL_MAPS_BASISU_SUPPORT",
        "OPTIMISED_MESH_SUPPORT",
    }
    seen = {}
    for py_name, _, value in REFERENCE_IDS:
        if py_name in exclude:
            continue
        assert value not in seen, f"{py_name} collides with {seen[value]} at {value}"
        seen[value] = py_name
