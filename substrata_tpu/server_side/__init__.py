"""Server-side application services: accounts, sessions, auctions, orders,
asset pipeline threads, server scripting glue.

Parity with the reference server layer beyond the core loop
(server/User.*, UserWebSession.*, APIKey.*, PasswordReset.*,
ParcelAuction.*, Order.*, MeshLODGenThread.*, ServerSideScripting.*).
"""
